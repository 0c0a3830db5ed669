package graft

import org.apache.spark.sql.functions._

import graft.operators.StatsOps

/** Specs for exact distributed order statistics: literal rank
  * re-derivation, ties resolved by id, shared-rank probs, null
  * exclusion, and partition invariance. */
class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("exactQuantiles matches the literal ceil-rank re-derivation") {
    // values deliberately unordered by id, with ties
    val vals = Seq(5.0, 1.0, 3.0, 3.0, 9.0, 2.0, 7.0, 3.0, 8.0, 4.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val probs = Seq((1L, 4L), (1L, 2L), (3L, 4L), (1L, 1L))
    val got = StatsOps.exactQuantiles(df, "v", "id", probs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    val sorted = vals.zipWithIndex
      .sortBy { case (v, i) => (v, i) }.map(_._1)
    probs.foreach { case (pn, pd) =>
      val rank = (vals.length * pn + pd - 1) / pd
      assert(got((pn, pd)) == (rank, sorted(rank.toInt - 1)),
        s"p=$pn/$pd")
    }
    // median of 10 values at ceil(10/2)=5 -> 5th smallest = 3.0
    assert(got((1L, 2L))._2 == 3.0)
    assert(got((1L, 1L))._2 == 9.0) // max at rank n
  }

  test("probs sharing a rank each emit; nulls excluded; " +
      "partition-invariant") {
    val df = (Seq.fill(3)(Option.empty[Double]) ++
      (1 to 97).map(i => Some(i.toDouble)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    // n = 97 non-null; 50/100 and 1/2 share rank ceil(97/2) = 49
    def run(d: org.apache.spark.sql.DataFrame) =
      StatsOps.exactQuantiles(d, "v", "id",
        Seq((50L, 100L), (1L, 2L), (97L, 97L)))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val got = run(df)
    assert(got == Set((50L, 100L, 49L, 49.0), (1L, 2L, 49L, 49.0),
      (97L, 97L, 97L, 97.0)))
    assert(run(df.repartition(13)) == got)
    intercept[IllegalArgumentException] {
      StatsOps.exactQuantiles(df, "v", "id", Seq((3L, 2L)))
    }
  }

  test("filterByQuantileRange: inclusive exact bounds, nulls drop, " +
      "degenerate point range, malformed order rejected") {
    val df = ((1 to 100).map(i => (i.toLong, Some(i.toDouble))) :+
      (200L, Option.empty[Double])).toDF("id", "v")
    // p10 = value at ceil(100/10) = 10, p90 = at rank 90 — inclusive
    val kept = StatsOps.filterByQuantileRange(df, "v", "id",
        (1L, 10L), (9L, 10L))
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == (10L to 90L))
    // degenerate point range keeps exactly the median-valued rows
    val point = StatsOps.filterByQuantileRange(df, "v", "id",
        (1L, 2L), (1L, 2L))
      .collect().map(_.getLong(0)).toSeq
    assert(point == Seq(50L))
    intercept[IllegalArgumentException] {
      StatsOps.filterByQuantileRange(df, "v", "id", (9L, 10L), (1L, 10L))
    }
  }
}
