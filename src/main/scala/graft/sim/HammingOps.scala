package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-signature retrieval — the cheapest tier of the quantizer
  * family (Charikar 2002 sign-random-projection: the cosine between
  * two vectors is monotone in the expected Hamming agreement of
  * their sign signatures; "binary hashing" retrieval à la ITQ/LSH
  * surveys). A d-float vector compresses to `planes` sign bits in
  * ONE packed BIGINT — at 48 bits that is a 5,000× payload cut from
  * d=768 floats, the coarsest point on the PQ (m codes) / SQ8 (d
  * bytes) / binary (d bits→1 word) spectrum. Ranking is
  * `bit_count(xor(sig_q, sig_n))` ASC — pure integer ops, exact,
  * engine-portable (DuckDB has the same xor/bit_count), and
  * codegen-native on both sides.
  *
  * Where it sits operationally: [[Similarity.lshTopK]] uses the SAME
  * sign bits to select CANDIDATES (equal bucket keys) and then ranks
  * by exact cosine; this ranks by the Hamming distance itself — no
  * float touch at query time, so it is the shortlist stage you run
  * when even SQ8 decode is too expensive, refined by
  * [[PqOps.adcRerankTopK]]-style exact reranking when needed.
  *
  * Signatures come from [[graft.functions.HyperplaneBits]] (fused
  * codegen kernel; the deterministic seeded ±1 planes of the LSH
  * family, so the oracle inlines the same plane literals). A null or
  * wrong-dimension vector signs to the all-zero signature (the
  * kernel's convention — it still ranks, at distance = popcount of
  * the other side; corpora with degenerate vectors should filter
  * upstream). `planes` ≤ 63 so the signature packs one signed Long.
  *
  * Query side is caller-bounded (broadcast, the
  * [[Similarity.bruteForceTopK]] contract). The corpus side moves
  * (id, one Long) — at this payload a full scan per query batch IS
  * the scale plan (100 TB of vectors = ~0.2% of that in signatures).
  *
  * Reference scope: the reference pipeline has no ANN operator;
  * extends the similarity family per the build brief's training-data
  * mandate. */
object HammingOps {

  /** Packed sign signature: one BIGINT with bit p = [dot(vec,
    * plane_p) ≥ 0], planes from the deterministic seeded generator. */
  def signature(vec: Column, planes: Int, dim: Int = 64,
      seed: Long = 42L): Column = {
    require(planes >= 1 && planes <= 63, s"planes=$planes")
    val hp = Similarity.hyperplanes(planes, dim, seed)
    element_at(graft.functions.HyperplaneBits.bandKeys(vec,
      hp.map(_.toIndexedSeq).toIndexedSeq, 1, planes), 1)
  }

  /** Signature table: (idCol, sig) — a pure narrow projection. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      planes: Int = 48, dim: Int = 64, seed: Long = 42L): DataFrame =
    df.select(col(idCol).cast("long").as(idCol),
      signature(col(vecCol), planes, dim, seed).as("sig"))

  /** Hamming top-k: queries (caller-bounded, broadcast) against the
    * signature corpus ([[encode]] output). Returns (q_id, rank,
    * n_id, hdist) ranked (hdist ASC, n_id ASC); self-matches drop. */
  def hammingTopK(queries: DataFrame, encoded: DataFrame, k: Int,
      planes: Int = 48, dim: Int = 64, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    require(k >= 1, s"k=$k")
    val q = queries.select(col(idCol).cast("long").as("q_id"),
      signature(col(vecCol), planes, dim, seed).as("__qsig"))
    val c = encoded.select(col(idCol).cast("long").as("n_id"),
      col("sig").as("__nsig"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("hdist").asc, col("n_id").asc)
    broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        bit_count(col("__qsig").bitwiseXOR(col("__nsig")))
          .cast("int").as("hdist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "hdist")
  }
}
