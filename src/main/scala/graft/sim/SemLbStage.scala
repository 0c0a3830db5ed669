package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pair-stage-only timing for the lower-bound skip A/B (diagnostic
  * companion to [[SemLbSmoke]]): same pile corpus, times ONLY
  * `pqPairs` per arm plus a census of the sliver sizes. */
object SemLbStage {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val m = 4; val k = 16; val dsub = 128
    val nPiles = 64; val pileSize = 8 * factor
    def proto(s: Int, j: Int): Seq[Double] =
      (0 until dsub).map(t => (((j * 7 + s * 3 + t * 5) % 13) - 6).toDouble)
    val enumRows = (0 until k).map(j =>
      (j.toLong, (0 until m).flatMap(s => proto(s, j))))
    val pileRows = (0 until nPiles).flatMap { g =>
      val v = (0 until m).flatMap(s => proto(s, (g * (2 * s + 3) + s) % k))
      (0 until pileSize).map(r => ((k + g * pileSize + r).toLong, v))
    }
    val df = (enumRows ++ pileRows).toDF("vec_id", "embedding")
      .repartition(32).localCheckpoint(true)
    val n = df.count()
    val stride = math.max(1L, n / 16)
    val centRows = df.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>")).collect()
    val cIds = centRows.map(_.getLong(0)).toSeq
    val cVecs = centRows.map(_.getSeq[Double](1)).toSeq
    val members = df.select(col("vec_id").cast("long").as("id"),
        col("embedding").as("vec"))
      .withColumn("norm", sqrt(Similarity.dot(col("vec"), col("vec"))))
      .withColumn("pk", element_at(
        graft.functions.NearestCentroids.topIds(col("vec"), cIds, cVecs,
          1, 6), 1))
      .localCheckpoint(true)
    println(s"[stage] cluster sizes: " + members.groupBy("pk").count()
      .orderBy(desc("count")).limit(5).collect()
      .map(r => r.getLong(1)).mkString(","))
    for (arm <- Seq(true, false)) {
      val plan = SemDedup.pqPairs(df, members, 0.99, 1e6, "vec_id",
        "embedding", m, k, 1, lbSkip = arm)
        .queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Sort ")).map(_.trim.take(90))
      println(s"[plan] lbSkip=$arm\n  " + joins.mkString("\n  "))
    }
    for (arm <- Seq(true, false); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = SemDedup.pqPairs(df, members, 0.99, 1e6, "vec_id",
        "embedding", m, k, 1, lbSkip = arm).count()
      println(f"[stage] lbSkip=$arm rep=$rep pairs=$c " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
