package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN quality evaluation — the recall@k harness every approximate
  * index needs before it replaces an exact scan in a production
  * retrieval path (the FAISS/ann-benchmarks protocol: approximate
  * result vs exhaustive ground truth on a query panel).
  *
  * Scale shape: two aggregations and one LEFT SEMI join, all keyed by
  * (q_id, n_id) — map-side combinable, no broadcast of anything
  * result-derived (both inputs can be corpus-scale query panels; the
  * semi join is SHUFFLE_HASH-pinned). Recall is emitted as exact
  * integer micro-units (`(hits · 10^6) div truth`) so the output is
  * bit-reproducible and engine-portable — no float division.
  *
  * Reference scope: the reference pipeline has no retrieval-eval
  * operator; this closes the loop on the engine's ANN family
  * ([[Similarity]], [[PqOps]]) per the build brief's training-data
  * mandate. */
object EvalOps {

  /** Per-query recall of `approx` against `truth` (both shaped
    * (q_id, n_id) — extra columns ignored): n_hit = |approx ∩ truth|,
    * n_truth = |truth|, recall_micro = floor(10^6·n_hit/n_truth).
    * Queries present only in `approx` contribute no row (no truth to
    * recall against); queries with empty approx recall 0. */
  def recallAtK(approx: DataFrame, truth: DataFrame,
      idQ: String = "q_id", idN: String = "n_id"): DataFrame = {
    val a = approx.select(col(idQ).cast("long").as("q_id"),
      col(idN).cast("long").as("n_id"))
    val t = truth.select(col(idQ).cast("long").as("q_id"),
      col(idN).cast("long").as("n_id"))
    val hits = t.join(a.hint("shuffle_hash"), Seq("q_id", "n_id"),
        "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    t.groupBy("q_id").agg(count(lit(1)).as("n_truth"))
      .join(hits.hint("shuffle_hash"), Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("n_truth"),
        call_function("div",
          coalesce(col("n_hit"), lit(0L)) * lit(1000000L),
          col("n_truth")).as("recall_micro"))
  }
}
