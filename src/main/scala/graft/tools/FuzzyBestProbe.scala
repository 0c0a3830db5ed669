package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the q100 eager-checkpoint cost (BENCH_NOTES round
  * 12 late): is the fuzzyDedupDocsBest smoke delta (93.9 s lazy →
  * 143.6 s checkpointed at factor 100) the checkpoint defeating the
  * harness's count-only column pruning, or a real regression?
  *
  * Three measurements over the same amplified corpus:
  *   A. LAZY survivor composition (the pre-fix shape: no checkpoint,
  *      no hints) consumed by count() — the harness's old
  *      measurement, free to prune columns and reuse exchanges
  *      inside one plan;
  *   B. the same LAZY composition consumed FULL-WIDTH (sum of
  *      xxhash64 over every output column) — what a real consumer
  *      pays;
  *   C. the shipped [[graft.text.DedupOps.fuzzyDedupDocsBest]]
  *      (eager checkpoint + pinned joins), count() — the checkpoint
  *      already materialized everything, so the consumer shape no
  *      longer matters.
  *
  * Expectation if the pruning hypothesis holds: B ≈ C > A. If
  * instead C >> B, the checkpoint itself is the regression.
  *
  * Usage: runMain graft.tools.FuzzyBestProbe [sfDir] [factor] [reps]
  */
object FuzzyBestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(20)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .withColumn("copy", explode(sequence(lit(0), lit(factor - 1))))
      .select((col("doc_id") * factor + col("copy")).as("doc_id"),
        expr("regexp_replace(regexp_replace(lower(text), " +
          "'[^a-z0-9]+', ' '), '([a-z0-9]+)', '$1q' || copy)")
          .as("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

    import graft.text.{DedupOps, TextOps}
    val quality = TextOps.tokenCount(col("text")).cast("long")

    // the pre-fix lazy shape, reconstructed
    def lazyBest(): DataFrame = {
      val comps = DedupOps.fuzzyDedupDocs(docs, "doc_id", "text")
        .select(col("doc_id"), col("component"))
      val q = docs.select(col("doc_id").cast("long").as("doc_id"),
        quality.as("quality"))
      val labeled = comps.join(q, Seq("doc_id"))
      val surv = labeled.groupBy("component")
        .agg(max_by(col("doc_id"),
          struct(col("quality"), -col("doc_id"))).as("survivor"))
      labeled.join(surv, Seq("component"))
        .select(col("doc_id"), col("component"), col("survivor"),
          (col("doc_id") === col("survivor")).as("keep"),
          col("quality"))
    }

    def fullWidth(df: DataFrame): Long =
      df.select(df.columns.map(c =>
          bit_xor(xxhash64(col(c))).as(c)): _*)
        .collect().head.getLong(0)

    def time[T](label: String)(f: => T): Unit = (1 to reps).foreach {
      r =>
        val t0 = System.nanoTime()
        f
        println(f"""{"probe":"$label","rep":$r,"sec":${
          (System.nanoTime() - t0) / 1e9}%.1f}""")
    }

    time("A_lazy_count") { lazyBest().count() }
    time("B_lazy_fullwidth") { fullWidth(lazyBest()) }
    time("C_shipped_count") {
      DedupOps.fuzzyDedupDocsBest(docs, "doc_id", "text", quality)
        .count()
    }
    spark.stop()
  }
}
