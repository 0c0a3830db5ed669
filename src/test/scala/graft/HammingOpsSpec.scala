package graft

import org.apache.spark.sql.functions._

import graft.sim.{HammingOps, Similarity}

/** Specs for binary-signature Hamming retrieval: literal signature
  * re-derivation, popcount ranking, monotonicity vs cosine on
  * sign-aligned data, and partition invariance. */
class HammingOpsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs: Seq[(Long, Seq[Float])] = (0L until 12L).map { id =>
    id -> (0 until 64).map(i =>
      (((id * 37 + i * 11) % 41).toDouble / 41.0 - 0.5).toFloat)
  }
  private def df = vecs.toDF("vec_id", "embedding")

  test("signatures match the literal sign re-derivation; top-k ranks " +
      "by exact popcount with id tiebreak") {
    val planes = 48
    val hp = Similarity.hyperplanes(planes, 64)
    def sigOf(v: Seq[Float]): Long =
      (0 until planes).map { p =>
        val dot = v.zip(hp(p)).map { case (x, h) => x.toDouble * h }.sum
        if (dot >= 0.0) 1L << p else 0L
      }.sum
    val sigs = HammingOps.encode(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(sigs(id) == sigOf(v), s"sig of $id")
    }
    val got = HammingOps.hammingTopK(df.filter(col("vec_id") < 3),
        HammingOps.encode(df, "vec_id", "embedding"), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3))).toSet
    val want = (for {
      q <- 0L until 3L
      n <- 0L until 12L if n != q
    } yield (q, n, java.lang.Long.bitCount(
      sigs(q) ^ sigs(n)))).groupBy(_._1).flatMap { case (q, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(4).zipWithIndex
        .map { case ((_, n, d), i) => (q, i + 1, n, d) }
    }.toSet
    assert(got == want)
  }

  test("identical vectors are at distance 0 and rank first; " +
      "partition-invariant") {
    val withDup = df.unionAll(Seq(
      (100L, vecs(2)._2)).toDF("vec_id", "embedding"))
    def run(d: org.apache.spark.sql.DataFrame) =
      HammingOps.hammingTopK(withDup.filter(col("vec_id") === 2),
        HammingOps.encode(d, "vec_id", "embedding"), 3)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getInt(3)))
        .toSeq.sortBy(_._1)
    val got = run(withDup)
    assert(got.head == (1, 100L, 0))
    assert(run(withDup.repartition(7)) == got)
  }
}
