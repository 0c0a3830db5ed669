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

  test("wide signatures match the literal per-word re-derivation and " +
      "rank by the word-summed popcount") {
    val planes = 128; val bpw = 32; val words = planes / bpw
    val hp = Similarity.hyperplanes(planes, 64)
    def sigOf(v: Seq[Float]): Seq[Long] =
      (0 until words).map { w =>
        (0 until bpw).map { r =>
          val dot = v.zip(hp(w * bpw + r))
            .map { case (x, h) => x.toDouble * h }.sum
          if (dot >= 0.0) 1L << r else 0L
        }.sum
      }
    val sigs = HammingOps.encodeWide(df, "vec_id", "embedding",
        planes, 64, 42L, bpw)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    vecs.foreach { case (id, v) =>
      assert(sigs(id) == sigOf(v), s"wide sig of $id")
    }
    def hd(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val got = HammingOps.hammingTopKWide(df.filter(col("vec_id") < 3),
        HammingOps.encodeWide(df, "vec_id", "embedding"), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3))).toSet
    val want = (for {
      q <- 0L until 3L
      n <- 0L until 12L if n != q
    } yield (q, n, hd(sigs(q), sigs(n)))).groupBy(_._1)
      .flatMap { case (q, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(4).zipWithIndex
          .map { case ((_, n, d), i) => (q, i + 1, n, d) }
      }.toSet
    assert(got == want)
    // whole-word contract enforced
    intercept[IllegalArgumentException] {
      HammingOps.signatureWide(col("embedding"), 100, 64, 42L, 32)
    }
  }

  test("rerank recovers the exact-cosine order over the shortlist " +
      "and a full-corpus shortlist equals brute force") {
    val enc = HammingOps.encodeWide(df, "vec_id", "embedding")
    // shortlist = corpus size: stage 2 sees every candidate, so the
    // result must equal the exact brute-force ranking
    val got = HammingOps.hammingRerankTopK(
        df.filter(col("vec_id") < 3), df, enc, 4, 11)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val brute = Similarity.bruteForceTopK(
        df.filter(col("vec_id") < 3), df, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == brute)
    intercept[IllegalArgumentException] {
      HammingOps.hammingRerankTopK(df, df, enc, 5, 4)
    }
  }

  test("recommendedShortlist is the measured 40x floor and always " +
      "a legal shortlist") {
    assert(HammingOps.recommendedShortlist(1) == 40)
    assert(HammingOps.recommendedShortlist(10) == 400)
    // legal by construction: >= k, so the rerank accepts it directly
    val got = HammingOps.hammingRerankTopK(
      df.filter(col("vec_id") < 2), df,
      HammingOps.encodeWide(df, "vec_id", "embedding"), 2,
      HammingOps.recommendedShortlist(2))
    assert(got.count() == 2 * 2)
    intercept[IllegalArgumentException] {
      HammingOps.recommendedShortlist(0)
    }
    intercept[ArithmeticException] { // overflow refuses, not wraps
      HammingOps.recommendedShortlist(Int.MaxValue / 4)
    }
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
