package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hard-negative mining for contrastive/embedding training — the
  * retrieval step that turns a corpus into (query, negatives)
  * training pairs (Karpukhin et al. 2020 DPR §4.2's "hard negatives
  * from the retriever"; the standard recipe across dense-retriever
  * and sentence-embedding training): for each query document, the
  * top-k most similar corpus documents that are NOT positives — high
  * similarity makes them informative negatives, but anything above
  * `posThreshold` is treated as a paraphrase/near-duplicate of the
  * query (a FALSE negative that would poison the contrastive loss;
  * the same cosine band SemDeDup ([[SemDedup]]) treats as
  * semantic duplication) and excluded.
  *
  * Dataflow: one [[Similarity.ivfTopK]] retrieval of a `poolK`-deep
  * candidate pool per query (coarse lists bound the candidate count
  * — the corpus never cross-joins), then the positive filter and an
  * exact re-rank of the survivors. `poolK` controls crowding: if a
  * query has p near-positives in its pool, only poolK − p candidates
  * remain, so callers expecting dense near-duplicate neighborhoods
  * should widen the pool (default 4·k). Rows with NULL cosine
  * (zero-norm vectors) drop with the positives — a degenerate vector
  * is not evidence of hardness.
  *
  * Determinism: cosines are the rounded-micro values of the IVF
  * family (identical arithmetic in the DuckDB oracle); ranks break
  * ties by (cos DESC, n_id ASC). Returns (q_id, rank, n_id, cos)
  * with rank 1..≤k — a query may return fewer than k rows when the
  * filtered pool runs dry (count the rows, don't assume k).
  *
  * Reference scope: the reference pipeline has no retrieval-mining
  * operator; extends the similarity family per the build brief's
  * training-data mandate. */
object MineOps {

  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
      posThreshold: Double, poolK: Int = 0, numCentroids: Int = 256,
      nProbe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k=$k")
    val pool = if (poolK > 0) poolK else 4 * k
    require(pool >= k, s"poolK=$pool < k=$k")
    val cand = Similarity.ivfTopK(queries, corpus, pool,
      numCentroids, nProbe, idCol, vecCol)
    // bounded top-k aggregate on the already-filtered pool (the
    // threshold drops null cosines, so the -cos key is total);
    // see [[graft.functions.TopK]]
    graft.functions.TopK.perQueryCut(
      cand.filter(col("cos") < posThreshold)
        .select(col("q_id"), col("n_id"), col("cos")),
      k, coalesce(-col("cos"), lit(Double.PositiveInfinity)), "cos")
  }
}
