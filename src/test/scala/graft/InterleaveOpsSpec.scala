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

  test("byTokens: hand-traced WFQ schedule (token-fair prefixes)") {
    // a (w=1): sizes [2,2]; b (w=1): sizes [1,1,1,1]. M = lcm(2)=2.
    // keys: a1 floor((0+2)*2/2)=2, a2 floor((4+2)*2/2)=6;
    //       b1 1, b2 3, b3 5, b4 7  ->  order b a b b a b:
    // after any 2t tokens each stratum has contributed ~t.
    val df = Seq(
      (1L, "a", 2L), (2L, "a", 2L),
      (10L, "b", 1L), (11L, "b", 1L), (12L, "b", 1L), (13L, "b", 1L))
      .toDF("id", "s", "tok")
    val out = InterleaveOps.proportionalInterleaveByTokens(df, "s",
        "id", "tok", Map("a" -> 1L, "b" -> 1L))
      .select("id", "mix_k", "mix_key", "seq")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    assert(out.map(_._1).toSeq == Seq(10L, 1L, 11L, 12L, 2L, 13L))
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 3L, 5L, 6L, 7L))
  }

  test("byTokens with size 1 equals the doc-count schedule exactly") {
    val df = spark.range(40).select(col("id"),
      concat(lit("s"), (col("id") % 3).cast("string")).as("s"),
      lit(1L).as("tok"))
    val w = Map("s0" -> 3L, "s1" -> 2L, "s2" -> 1L)
    val a = InterleaveOps.proportionalInterleave(
        df.drop("tok"), "s", "id", w)
      .select("id", "mix_k", "mix_key", "seq")
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = InterleaveOps.proportionalInterleaveByTokens(
        df, "s", "id", "tok", w)
      .select("id", "mix_k", "mix_key", "seq")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("byTokens fails loudly on null and negative sizes") {
    val bad = Seq((1L, "a", Some(3L)), (2L, "a", None))
      .toDF("id", "s", "tok")
    val e1 = intercept[org.apache.spark.SparkException] {
      InterleaveOps.proportionalInterleaveByTokens(bad, "s", "id",
        "tok", Map("a" -> 1L)).count()
    }
    assert(e1.getMessage.contains("null") ||
      Option(e1.getCause).exists(_.getMessage.contains("null")))
    val neg = Seq((1L, "a", 3L), (2L, "a", -1L)).toDF("id", "s", "tok")
    val e2 = intercept[org.apache.spark.SparkException] {
      InterleaveOps.proportionalInterleaveByTokens(neg, "s", "id",
        "tok", Map("a" -> 1L)).count()
    }
    assert(e2.getMessage.contains("negative") ||
      Option(e2.getCause).exists(_.getMessage.contains("negative")))
  }

  test("byTokens: resolution rank-capped by TOKEN totals (overflow)") {
    // one stratum with 1e6 total tokens under M = 2^50: uncapped,
    // (x div 2w)*M wraps; the post-pass cap uses the token sum
    val df = spark.range(1000L).select(col("id"),
      lit("a").as("s"), lit(1000L).as("tok"))
    val out = InterleaveOps.proportionalInterleaveByTokens(df, "s",
        "id", "tok", Map("a" -> 3L), resolution = 1L << 50)
      .select("mix_k", "mix_key").as[(Long, Long)].collect()
      .sortBy(_._1)
    assert(out.forall(_._2 >= 0L), "mix_key wrapped negative")
    out.iterator.sliding(2).withPartial(false).foreach { w =>
      assert(w(0)._2 <= w(1)._2, s"keys not monotone at k=${w(1)._1}")
    }
  }

  test("byTokens prefix fairness: token share tracks weights") {
    // strata with very different doc lengths: a has few huge docs,
    // b many small ones; equal weights => every prefix's token
    // split stays near 50/50 (within one max doc size)
    val a = (0L until 20L).map(i => (i, "a", 500L))
    val b = (100L until 1100L).map(i => (i, "b", 10L))
    val df = (a ++ b).toDF("id", "s", "tok")
    val rows = InterleaveOps.proportionalInterleaveByTokens(df, "s",
        "id", "tok", Map("a" -> 1L, "b" -> 1L))
      .select("s", "tok", "seq").as[(String, Long, Long)]
      .collect().sortBy(_._3)
    var ta = 0L; var tb = 0L
    rows.foreach { case (s, tok, _) =>
      if (s == "a") ta += tok else tb += tok
      assert(math.abs(ta - tb) <= 510L,
        s"prefix token imbalance: a=$ta b=$tb")
    }
  }

  test("commonResolution: exact lcm under the cap, cap beyond") {
    assert(InterleaveOps.commonResolution(Seq(8L, 4L, 2L), 1L << 42) == 8L)
    assert(InterleaveOps.commonResolution(Seq(6L, 10L, 15L), 1L << 42) == 30L)
    assert(InterleaveOps.commonResolution(
      Seq(1000003L, 1000033L, 1000037L, 1000039L), 1L << 42) == (1L << 42))
  }
}
