package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** Canary for [[graft.functions.TopK]]'s ride on Spark's internal
  * `CollectTopK` via `GraftTopKBridge` (VERDICT r16 ask #4). The
  * bridge is version-pinned to Spark internals; this spec pins the
  * SEMANTICS the retrieval family depends on against literal frames,
  * so a Spark upgrade that drifts the aggregate (ordering direction,
  * null placement, eval sort, partial-merge behavior) fails here
  * with a named test instead of inside a retrieval query's hash.
  */
class TopKBridgeSpec extends SparkSpec {
  import spark.implicits._

  test("smallestK keeps the k smallest keys, sorted ascending (best first)") {
    val df = Seq(5, 1, 4, 2, 3).toDF("x")
    val got = df.agg(TopK.smallestK(struct($"x"), 2).as("top"))
      .select(explode($"top.x")).as[Int].collect().toSeq
    assert(got == Seq(1, 2))
  }

  test("struct key: ties on the leading field break by the second field") {
    // two rows tie at s=1; the unique tiebreak id must decide, and the
    // kept set must be a total order (ids 10 then 11, never 11 alone)
    val df = Seq((1, 11), (2, 30), (1, 10), (3, 40)).toDF("s", "id")
    val got = df.agg(TopK.smallestK(struct($"s", $"id"), 2).as("top"))
      .select(explode($"top")).select("col.s", "col.id")
      .as[(Int, Int)].collect().toSeq
    assert(got == Seq((1, 10), (1, 11)))
  }

  test("k larger than the group returns the whole group, still sorted") {
    val df = Seq(3, 1, 2).toDF("x")
    val got = df.agg(TopK.smallestK(struct($"x"), 10).as("top"))
      .select(explode($"top.x")).as[Int].collect().toSeq
    assert(got == Seq(1, 2, 3))
  }

  test("nulls sort FIRST in the struct field (the documented asc default)") {
    // the retrieval callers rely on this: nulls-last semantics are
    // encoded by the caller via coalesce(-cos, +Inf), which only works
    // because the raw interpreted ordering would otherwise rank nulls
    // first — if Spark flips this default, this test names the break
    val df = Seq[(java.lang.Integer, Int)]((5, 1), (null, 2), (3, 3))
      .toDF("s", "id")
    val got = df.agg(TopK.smallestK(struct($"s", $"id"), 2).as("top"))
      .select(explode($"top")).select("col.s", "col.id").collect().toSeq
    assert(got == Seq(Row(null, 2), Row(3, 3)))
  }

  test("partial aggregation merges map-side heaps exactly (many partitions)") {
    // 1000 rows spread over 8 partitions: each map task's bounded heap
    // contributes <= k entries; the merged result must equal the exact
    // global answer regardless of which partition held which row
    val df = spark.range(1000).repartition(8)
      .select((((col("id") * 7919) % 1000) + 1).as("x"))
    val got = df.agg(TopK.smallestK(struct($"x"), 5).as("top"))
      .select(explode($"top.x")).as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("perQueryCut: rank is 1-based, ascending by encoded key, per group") {
    val scored = Seq(
      (1L, 101L, 0.9), (1L, 102L, 0.7), (1L, 103L, 0.8),
      (2L, 201L, 0.1), (2L, 202L, 0.5)).toDF("q_id", "n_id", "cos")
    val cut = TopK.perQueryCut(scored, 2,
      coalesce(-$"cos", lit(Double.PositiveInfinity)), "cos")
    val got = cut.orderBy("q_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1, 101L, 0.9), (1L, 2, 103L, 0.8),
      (2L, 1, 202L, 0.5), (2L, 2, 201L, 0.1)))
  }
}
