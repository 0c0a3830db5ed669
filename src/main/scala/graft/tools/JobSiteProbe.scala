package graft.tools

import org.apache.spark.sql.SparkSession

/** Job-source census for one registry query: runs the query once
  * warm, then once counted, printing every Spark job's call site and
  * duration — so a high job tally (the AQE-stage + checkpoint class)
  * can be attributed to SITES instead of guessed at. Usage:
  * `runMain graft.tools.JobSiteProbe <sfDir> <query> [warmReps]` */
object JobSiteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q41_dedup_components")
    val warm = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to warm).foreach(_ => fn(spark, sfDir).count())
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          // stage names carry the action call site ("count at X:123");
          // the result stage (highest id) names the job's action
          val site = j.stageInfos.sortBy(_.stageId).lastOption
            .map(_.name).getOrElse("?")
          starts.put(j.jobId, (site, System.nanoTime()))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (site, t0) = starts.getOrDefault(j.jobId, ("?", 0L))
          val ms = if (t0 == 0) -1 else (System.nanoTime() - t0) / 1000000
          rows.add(f"""{"job":${j.jobId},"ms":$ms,"site":"$site"}""")
        }
      })
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    rows.asScala.toSeq.foreach(println)
    // aggregate by site
    val agg = rows.asScala.toSeq
      .map { s =>
        val site = s.split("\"site\":\"")(1).stripSuffix("\"}")
        val ms = s.split("\"ms\":")(1).split(",")(0).toLong
        (site, ms)
      }
      .groupBy(_._1).map { case (k, v) =>
        (k, v.size, v.map(_._2).sum)
      }.toSeq.sortBy(-_._3)
    println(s"=== $name: ${rows.size} jobs, ${f"$sec%.2f"} s ===")
    agg.foreach { case (site, n, ms) =>
      println(f"""{"site":"$site%s","jobs":$n,"total_ms":$ms}""")
    }
    spark.stop()
  }
}
