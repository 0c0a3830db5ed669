package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the tokenized corpus — the classic
  * Robertson/Spärck Jones weighting (k1/b form), the standard recall
  * stage for corpus curation tasks (finding training docs relevant
  * to a probe set, search-based decontamination triage, eval-set
  * neighborhood audits). LLM-corpus extension surface.
  *
  * Scoring, exactly mirrorable in SQL:
  *   - postings: per (doc, token) term frequency over
  *     [[TextOps.tokens]]; doc length = token count; avgdl and N are
  *     corpus scalars.
  *   - idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the +1 keeps it
  *     positive for df > N/2, the common "BM25+" guard.
  *   - contribution(t, d) = idf·tf·(k1+1) / (tf + k1·((1−b) + b·dl/avgdl)),
  *     with DISTINCT query terms (query-side tf is 1 by contract).
  *   - determinism: each (t, d) contribution is floor-quantized to
  *     MICRO units as BIGINT ([[LmOps]] convention) so per-(query,
  *     doc) totals are exact order-invariant BIGINT sums; ranking is
  *     the total order (score_micro DESC, doc id ASC). Defaults
  *     k1 = 1.2 (identical decimal literal both engines) and b = 0.75
  *     (dyadic).
  *
  * Scale shape (100 TB corpus, parameter-sized query set):
  *   - the postings table is corpus-sized and NEVER moves toward the
  *     queries: the exploded distinct query-term table (|Q|·terms
  *     rows, a parameter) broadcasts onto postings.
  *   - per-(query, doc) sums group on a (qid, doc) key — map-side
  *     combined, no skew beyond real match volume.
  *   - top-k per query never builds a per-query global partition
  *     (k queries ⇒ k partitions would each hold every matching doc —
  *     the classic window-skew trap): stage 1 ranks within (qid,
  *     salt = doc_id mod salts) partitions and keeps k per salt,
  *     stage 2 ranks the ≤ k·salts survivors per query. Any global
  *     top-k row is in its salt's top k, so the composition is exact,
  *     and the widest partition shrinks from |matches| to
  *     |matches|/salts (stage 1) and k·salts (stage 2).
  */
object RankOps {

  private val MicroScale = 1e6

  /** Top-k docs per query by BM25. `queries` is a parameter-sized
    * (qidCol, qtextCol) table; scoring uses its DISTINCT tokens.
    * Returns (qidCol, idCol, score_micro, rank) with rank ≤ k under
    * (score_micro DESC, idCol ASC). */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      qidCol: String = "query_id", qtextCol: String = "qtext",
      k1: Double = 1.2, b: Double = 0.75, salts: Int = 8): DataFrame = {
    require(k > 0 && salts > 0, s"k=$k salts=$salts")

    val postings = corpus
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val docLen = corpus.select(col(idCol),
      TextOps.tokenCount(col(textCol)).cast("long").as("dl"))

    // N and avgdl: one bounded single-row action.
    val nRow = docLen.agg(count(lit(1)).as("n"),
      coalesce(sum("dl"), lit(0L)).as("tot")).head()
    val n = nRow.getLong(0)
    val avgdl = if (n == 0) 1.0 else nRow.getLong(1).toDouble / n

    val dfTab = postings.groupBy("token")
      .agg(count(lit(1)).as("n_docs"))
    val qTerms = queries
      .select(col(qidCol),
        explode(array_distinct(TextOps.tokens(col(qtextCol)))).as("token"))

    // Query terms broadcast onto postings (the corpus never moves);
    // df and dl attach on their natural keys — both corpus-derived,
    // so SHUFFLE_HASH, never broadcast.
    val idf = log(lit(1.0) +
      (lit(n.toDouble) - col("n_docs") + 0.5) / (col("n_docs") + 0.5))
    val tfn = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgdl))))
    val contrib = postings
      .join(broadcast(qTerms), Seq("token"))
      .join(dfTab.hint("shuffle_hash"), Seq("token"))
      .join(docLen.hint("shuffle_hash"), Seq(idCol))
      .select(col(qidCol), col(idCol),
        floor(idf * tfn * MicroScale + 0.5).cast("long").as("c_micro"))

    val scored = contrib
      .groupBy(col(qidCol), col(idCol))
      .agg(sum("c_micro").as("score_micro"))

    // Two-stage exact top-k (see scaladoc): salt, rank, re-rank.
    val salted = scored.withColumn("salt", pmod(col(idCol), lit(salts)))
    val w1 = Window.partitionBy(col(qidCol), col("salt"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
    val w2 = Window.partitionBy(col(qidCol))
      .orderBy(col("score_micro").desc, col(idCol).asc)
    salted
      .withColumn("r1", row_number().over(w1)).filter(col("r1") <= k)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("score_micro"),
        col("rank").cast("long").as("rank"))
  }
}
