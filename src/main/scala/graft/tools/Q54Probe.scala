package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused re-adjudication of q54_merge_legality (VERDICT r15 ask
  * #2): N warm in-JVM timings plus a Spark-job count, so a drifted
  * bench reading can be split into (a) steady-state plan cost vs
  * (b) first-touch/JIT noise, and compared across rounds without a
  * full bench run. Prints one JSON line per rep and a job tally. */
object Q54Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(8)
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
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    val fn = graft.SparkEntry.queries("q54_merge_legality")
    val times = (1 to reps).map { i =>
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"""{"probe":"q54","rep":$i,"sec":$sec%.3f,""" +
        s""""jobs":${jobs.get() - j0}}""")
      sec
    }
    println(f"""{"probe":"q54","min":${times.min}%.3f,""" +
      f""""median":${times.sorted.apply(reps / 2)}%.3f}""")
    spark.stop()
  }
}
