package graft

import org.apache.spark.sql.functions._

import graft.text.VocabOps

/** Specs for the bounded-state heavy-hitter vocabulary: the
  * Misra–Gries summary's superset guarantee against a sequential
  * count, exactness and partitioning-invariance of the final frame,
  * and the threshold edge (strictly-above, integer rational). */
class VocabOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mgSummary keeps every token above the 1/(k+1) share " +
      "(superset guarantee), within the k-counter bound") {
    val rng = new scala.util.Random(7)
    // skewed stream: token i appears ~ 1/(i+1) as often
    val stream = Seq.fill(5000)(s"t${math.min(
      (1.0 / (rng.nextDouble() + 1e-9)).toInt % 200, 199)}")
    for (k <- Seq(4, 9, 20)) {
      val kept = VocabOps.mgSummary(stream.iterator, k).toSet
      assert(kept.size <= k)
      val counts = stream.groupBy(identity).view.mapValues(_.size)
      val mustKeep = counts.filter {
        case (_, n) => n.toLong * (k + 1) > stream.size }.keySet
      assert(mustKeep.subsetOf(kept),
        s"k=$k lost ${mustKeep -- kept}")
    }
  }

  test("heavyHitters is exact, strictly-above, and " +
      "partitioning-invariant on a many-token corpus") {
    val rng = new scala.util.Random(13)
    // 400 docs over a 300-word vocabulary with a few dominant words
    val docs = (0 until 400).map { i =>
      val common = Seq.fill(6)(Seq("alpha", "beta", "gamma")(
        rng.nextInt(3)))
      val rare = Seq.fill(4)(s"w${rng.nextInt(300)}")
      (i.toLong, (common ++ rare).mkString(" "))
    }.toDF("doc_id", "text")
    val toks = docs.collect().flatMap(
      _.getString(1).split(" ")).toSeq
    val n = toks.size.toLong
    val brute = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 50L > n * 1L }
      .toMap
    for (parts <- Seq(1, 3, 17)) {
      val got = VocabOps.heavyHitters(docs.repartition(parts),
          "text", 1L, 50L)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(got.view.mapValues(_._1).toMap == brute, s"parts=$parts")
      assert(got.values.forall(_._2 == n))
    }
    // threshold is STRICTLY above: a token at exactly φ·N is out
    val exact = (("x " * 25) + ("y " * 75)).trim
    val one = Seq((0L, exact)).toDF("doc_id", "text")
    val hh = VocabOps.heavyHitters(one, "text", 1L, 4L)
      .collect().map(_.getString(0)).toSet
    assert(hh == Set("y")) // x = 25 of 100 = exactly 1/4 — excluded
  }

  test("empty corpus yields an empty frame with the right schema") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = VocabOps.heavyHitters(empty, "text", 1L, 10L)
    assert(out.columns.toSeq == Seq("token", "n_tok", "n_total"))
    assert(out.count() == 0L)
  }
}
