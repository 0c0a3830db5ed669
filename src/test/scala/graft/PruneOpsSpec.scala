package graft

import org.apache.spark.sql.functions._

import graft.sim.PruneOps

/** Direct specs for SSL-prototype pruning: the per-cluster cut
  * against a literal re-derivation, null-cosine ranking, exact
  * integer cut arithmetic, and partition invariance. */
class PruneOpsSpec extends SparkSpec {
  import spark.implicits._

  // Two clear clusters around ids 0 and 4 (the stride-4 centroids),
  // plus a zero vector that must score null and rank last.
  private val vecs: Seq[(Long, Seq[Double])] = Seq(
    0L -> Seq(1.0, 0.0), 1L -> Seq(0.9, 0.1), 2L -> Seq(0.8, 0.2),
    3L -> Seq(0.7, 0.3), 4L -> Seq(0.0, 1.0), 5L -> Seq(0.1, 0.9),
    6L -> Seq(0.2, 0.8), 7L -> Seq(0.0, 0.0))
  private def df = vecs.map { case (id, v) => (id, v.map(_.toFloat)) }
    .toDF("vec_id", "embedding")

  private def brute(frac: (Long, Long), stride: Long) = {
    val p = 1e6
    def rcos(a: Seq[Double], b: Seq[Double]): Option[Double] = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na > 0.0 && nb > 0.0)
        Some(math.floor(a.zip(b).map { case (x, y) => x * y }.sum /
          (na * nb) * p + 0.5) / p)
      else None
    }
    val fl = vecs.map { case (id, v) => id -> v.map(_.toFloat.toDouble) }
    val cents = fl.filter(_._1 % stride == 0)
    val assigned = fl.map { case (id, v) =>
      val (cid, cos) = cents.map { case (c, cv) => (c, rcos(v, cv)) }
        .sortBy { case (c, co) => (co.map(-_).getOrElse(Double.MaxValue), c) }
        .head
      (id, cid, cos)
    }
    assigned.groupBy(_._2).flatMap { case (cl, rows) =>
      val ranked = rows.sortBy { case (id, _, co) =>
        (co.map(-_).getOrElse(Double.MaxValue), id) }
      val nDrop = ranked.size.toLong * frac._1 / frac._2
      ranked.zipWithIndex.map { case ((id, _, co), i) =>
        (id, cl, co, i + 1, ranked.size.toLong, (i + 1) > nDrop)
      }
    }.toSet
  }

  test("protoPrune matches literal re-derivation incl. null-cos ranking") {
    val want = brute((1L, 4L), 4L)
    Seq(1, 5).foreach { parts =>
      val got = PruneOps.protoPrune(df.repartition(parts), 1L, 4L,
          centroidStride = 4L).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3),
          r.getLong(4), r.getBoolean(5)))
        .toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("fraction 0 keeps everything; fraction 1 drops all but null-cos rows") {
    val keepAll = PruneOps.protoPrune(df, 0L, 1L, centroidStride = 4L)
      .collect()
    assert(keepAll.forall(_.getBoolean(5)))
    // frac 1: nDrop = n per cluster -> keep nothing (rank <= n always);
    // the zero vector ranks last in its cluster but n_drop covers it.
    val dropAll = PruneOps.protoPrune(df, 1L, 1L, centroidStride = 4L)
      .collect()
    assert(dropAll.forall(r => !r.getBoolean(5)))
  }

  test("skewed corpus (one cluster = 50% of rows) matches the window form") {
    // 200 rows, 100 of them piling into the centroid-0 cluster — the
    // pathological SemDeDup shape the two-level rank exists for. The
    // oracle is the single-window row_number form protoPrune used
    // through r16, computed inline: ranks, sizes, and keep bits must
    // be bit-identical (the two-level rank is exact, not approximate).
    import org.apache.spark.sql.expressions.Window
    val rows: Seq[(Long, Seq[Float])] = (0L until 200L).map { id =>
      if (id % 2 == 0) // half the corpus: tight cone around (1, 0)
        id -> Seq(1.0f, (id % 13).toFloat / 1000f)
      else // the rest spreads over distinct directions
        id -> Seq((id % 7).toFloat / 10f, 1.0f + (id % 11).toFloat / 10f)
    }
    val skew = rows.toDF("vec_id", "embedding").repartition(7)
    val got = PruneOps.protoPrune(skew, 1L, 4L, centroidStride = 100L)
    // window-form oracle over got's own (id, cluster, cos_c) columns
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("cos_c").desc_nulls_last, col("id").asc)
    val wc = Window.partitionBy(col("cluster"))
    val oracle = got.select("id", "cluster", "cos_c")
      .withColumn("rank", row_number().over(w))
      .withColumn("cluster_n", count(lit(1)).over(wc))
      .withColumn("keep", col("rank") >
        graft.text.MixOps.mulDivFloor(col("cluster_n"), 1L, 4L))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3),
        r.getLong(4), r.getBoolean(5))
    val gotSet = got.collect().map(key).toSet
    assert(gotSet == oracle.collect().map(key).toSet)
    // the skew premise actually holds: one cluster >= half the corpus
    assert(gotSet.groupBy(_._2).values.map(_.size).max >= 100)
  }

  test("exact integer cut: floor(n * 1/3) per cluster") {
    // cluster of 4 and cluster of 4 (incl. zero vec): floor(4/3) = 1
    // dropped each -> 6 kept of 8.
    val out = PruneOps.protoPrune(df, 1L, 3L, centroidStride = 4L)
      .collect()
    assert(out.count(_.getBoolean(5)) == 6)
    // the dropped ones are exactly each cluster's rank-1 row
    assert(out.filter(r => !r.getBoolean(5)).map(_.getInt(3)).toSeq
      .sorted == Seq(1, 1))
  }
}
