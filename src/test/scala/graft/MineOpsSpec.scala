package graft

import org.apache.spark.sql.functions._

import graft.sim.{MineOps, Similarity}

/** Specs for hard-negative mining: the positive filter, the exact
  * re-rank, pool crowding, and null-cosine exclusion. */
class MineOpsSpec extends SparkSpec {
  import spark.implicits._

  // queries 0/1 near a cluster of near-duplicates (positives) plus
  // moderately-similar docs (the negatives we want) plus orthogonal
  // noise and a zero vector
  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(1f, 0f, 0f, 0f),
    1L -> Seq(0f, 1f, 0f, 0f),
    2L -> Seq(0.99f, 0.1f, 0f, 0f),   // near-dup of 0 (positive)
    3L -> Seq(0.8f, 0.6f, 0f, 0f),    // hard negative for both
    4L -> Seq(0.1f, 0.99f, 0f, 0f),   // near-dup of 1 (positive)
    5L -> Seq(0.6f, 0.8f, 0f, 0f),    // hard negative
    6L -> Seq(0f, 0f, 1f, 0f),        // easy negative
    7L -> Seq(0f, 0f, 0f, 0f))        // zero vector: null cos
  private def df = vecs.toDF("vec_id", "embedding")

  test("positives and null cosines drop; survivors re-rank exactly") {
    val got = MineOps.hardNegatives(df.filter(col("vec_id") < 2), df,
        k = 3, posThreshold = 0.95, poolK = 7,
        numCentroids = centProbe._1, nProbe = centProbe._2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    // literal reference: full pool via ivfTopK, filter, re-rank
    val pool = Similarity.ivfTopK(df.filter(col("vec_id") < 2), df, 7,
        centProbe._1, centProbe._2)
      .collect().map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val want = pool.toSeq.groupBy(_._1).flatMap { case (q, rows) =>
      rows.collect { case (_, n, Some(c)) if c < 0.95 => (n, c) }
        .sortBy { case (n, c) => (-c, n) }.take(3).zipWithIndex
        .map { case ((n, c), i) => (q, i + 1, n, c) }
    }.toSet
    assert(got.toSet == want)
    // the near-duplicates (2 for query 0; 4 for query 1) are absent
    assert(!got.exists(r => r._1 == 0L && r._3 == 2L))
    assert(!got.exists(r => r._1 == 1L && r._3 == 4L))
    // the zero vector never appears
    assert(!got.exists(_._3 == 7L))
    // the hard negatives lead each query's list
    assert(got.filter(_._1 == 0L).minBy(_._2)._3 == 3L)
    assert(got.filter(_._1 == 1L).minBy(_._2)._3 == 5L)
  }

  test("pool crowding: a pool full of positives returns fewer than k") {
    // every non-query doc is a near-dup of query 0
    val crowd = (Seq(0L -> Seq(1f, 0f, 0f, 0f)) ++
      (1L to 5L).map(i => i -> Seq(1f, i * 1e-4f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = MineOps.hardNegatives(crowd.filter(col("vec_id") === 0),
      crowd, k = 3, posThreshold = 0.95, poolK = 5,
      numCentroids = 1, nProbe = 1, idCol = "vec_id",
      vecCol = "embedding")
    assert(got.count() == 0L)
  }

  // every list probed so the spec exercises the filter/re-rank, not
  // probe recall: 8 centroids (stride 1 via numCentroids = count)
  private val centProbe = (8, 8)
}
