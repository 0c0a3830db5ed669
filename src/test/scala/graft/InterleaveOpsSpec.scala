package graft

import org.apache.spark.sql.functions._

import graft.text.InterleaveOps

/** Stride-scheduled mixture interleave specs: quantized order vs the
  * exact rational EDF order (lossless-M case), the stride-scheduling
  * prefix-proportionality bound, null-stratum folding, unknown-strata
  * drop, and partition invariance. */
class InterleaveOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Exact-rational reference: sort (s, k) by virtual time
    * (2k−1)/(2·w_s) with BigInt cross-multiplied comparison, ties by
    * (stratum, k) — the unquantized stride schedule. */
  private def refOrder(ns: Map[String, Int],
      w: Map[String, Long]): Seq[(String, Long)] = {
    val items = for {
      (s, cnt) <- ns.toSeq
      k <- 1 to cnt
    } yield (s, k.toLong)
    items.sortWith { case ((s1, k1), (s2, k2)) =>
      val l = BigInt(2 * k1 - 1) * w(s2)
      val r = BigInt(2 * k2 - 1) * w(s1)
      if (l != r) l < r else if (s1 != s2) s1 < s2 else k1 < k2
    }
  }

  private def runOrder(ns: Map[String, Int], w: Map[String, Long])
      : Seq[(String, Long)] = {
    val rows = for {
      (s, cnt) <- ns.toSeq
      k <- 1 to cnt
    } yield (s"$s${"%03d".format(k)}", s)
    val df = rows.toDF("id", "lang")
    InterleaveOps.proportionalInterleave(df, "lang", "id", w)
      .orderBy("seq")
      .select(col("lang"), col("mix_k"))
      .as[(String, Long)].collect().toSeq
  }

  test("interleave matches the exact rational stride schedule") {
    val cases = Seq(
      (Map("a" -> 6, "b" -> 3, "c" -> 2), Map("a" -> 4L, "b" -> 2L, "c" -> 1L)),
      (Map("a" -> 5, "b" -> 5), Map("a" -> 1L, "b" -> 1L)),
      // weights with a common factor (internal gcd reduction) and a
      // stratum shorter than its proportional share
      (Map("x" -> 8, "y" -> 2, "z" -> 7), Map("x" -> 6L, "y" -> 9L, "z" -> 3L)))
    cases.foreach { case (ns, w) =>
      assert(runOrder(ns, w) == refOrder(ns, w), s"case $ns $w")
    }
  }

  test("every prefix holds the mixture to within one stride") {
    val ns = Map("a" -> 12, "b" -> 6, "c" -> 3)
    val w = Map("a" -> 4L, "b" -> 2L, "c" -> 1L)
    val wSum = w.values.sum.toDouble
    val order = runOrder(ns, w)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    order.zipWithIndex.foreach { case ((s, _), i) =>
      seen(s) = seen.getOrElse(s, 0) + 1
      val t = i + 1
      w.keys.foreach { st =>
        val expect = t * w(st) / wSum
        val got = seen.getOrElse(st, 0).toDouble
        assert(math.abs(got - expect) <= 1.0 + 1e-9,
          s"prefix $t stratum $st: got $got expect $expect")
      }
    }
  }

  test("null strata fold to empty string; unmapped strata drop") {
    val df = Seq(
      (1L, Some("en")), (2L, None), (3L, Some("en")), (4L, None),
      (5L, Some("xx"))).toDF("id", "lang")
    val out = InterleaveOps.proportionalInterleave(
      df, "lang", "id", Map("en" -> 1L, "" -> 1L))
    assert(out.count() == 4) // xx dropped
    val seqs = out.orderBy("seq").select("id").as[Long].collect().toSeq
    assert(seqs.toSet == Set(1L, 2L, 3L, 4L))
    // alternating: en and "" have equal weight
    assert(out.filter(col("lang").isNull).count() == 2)
  }

  test("seq is a 1..n permutation and partition-count invariant") {
    val ns = Map("a" -> 20, "b" -> 10, "c" -> 5)
    val w = Map("a" -> 7L, "b" -> 5L, "c" -> 2L)
    val base = runOrder(ns, w)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(runOrder(ns, w) == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val rows = for { (s, cnt) <- ns.toSeq; k <- 1 to cnt }
      yield (s"$s${"%03d".format(k)}", s)
    val out = InterleaveOps.proportionalInterleave(
      rows.toDF("id", "lang"), "lang", "id", w)
    val seqs = out.select("seq").as[Long].collect().sorted.toSeq
    assert(seqs == (1L to 35L).toSeq)
  }

  test("resolution is rank-capped: deep stratum under huge M keeps " +
      "keys monotone and non-negative (r14 overflow finding)") {
    // Before the cap, (k div w)·M wraps Long around k ≈ w·2^13 at
    // M = 2^50: stratum a (w=3, 30k docs) crosses that at k ≈ 24,576
    // and mix_key went negative, scrambling the order. The post-rank
    // cap bounds M by Long.MaxValue / (2·k_max) instead.
    val nA = 30000L
    val df = spark.range(nA).select(col("id"), lit("a").as("lang"))
      .unionAll(spark.range(1000000L, 1000010L)
        .select(col("id"), lit("b").as("lang")))
    val out = InterleaveOps.proportionalInterleave(df, "lang", "id",
      Map("a" -> 3L, "b" -> 7L), resolution = 1L << 50)
    val rows = out.select("lang", "mix_k", "mix_key")
      .as[(String, Long, Long)].collect()
    assert(rows.length == 30010)
    assert(rows.forall(_._3 >= 0L), "mix_key wrapped negative")
    rows.groupBy(_._1).foreach { case (s, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.iterator.sliding(2).withPartial(false).foreach { w =>
        assert(w(0)._3 <= w(1)._3,
          s"stratum $s keys not monotone at k=${w(1)._2}")
      }
    }
    // the schedule itself survives the cap: stratum b's 10 docs
    // (weight 7 vs 3) all land in the earliest prefix
    val head = out.orderBy("seq").limit(100)
      .select("lang").as[String].collect()
    assert(head.count(_ == "b") == 10)
  }

  test("commonResolution: exact lcm under the cap, cap beyond") {
    assert(InterleaveOps.commonResolution(Seq(8L, 4L, 2L), 1L << 42) == 8L)
    assert(InterleaveOps.commonResolution(Seq(6L, 10L, 15L), 1L << 42) == 30L)
    assert(InterleaveOps.commonResolution(
      Seq(1000003L, 1000033L, 1000037L, 1000039L), 1L << 42) == (1L << 42))
  }
}
