package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary probe: decompose dsirSelect wall time at an amplification
  * factor (same synthesis as [[TextScaleSmoke]]). */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val f = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .withColumn("copy", explode(sequence(lit(0), lit(f - 1))))
      .select((col("doc_id") * f + col("copy")).as("doc_id"),
        expr("regexp_replace(regexp_replace(lower(text), " +
          "'[^a-z0-9]+', ' '), '([a-z0-9]+)', '$1q' || copy)")
          .as("text"))
      .repartition(32) // one input split otherwise — see TextScaleSmoke
      .localCheckpoint(true)
    val target = docs.filter(pmod(col("doc_id"), lit(10)) < 3)
    println(s"docs=${docs.count()}")

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"DPROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("corpus_featurecounts") {
      graft.text.DsirOps.hashedNgramCounts(
        docs, "doc_id", "text", 1024, 7).count()
    }
    time("target_featurecounts") {
      graft.text.DsirOps.hashedNgramCounts(
        target, "doc_id", "text", 1024, 7).count()
    }
    time("importance_weights") {
      graft.text.DsirOps.importanceWeights(
        docs, target, "doc_id", "text", 1024).count()
    }
    time("full_select") {
      graft.text.DsirOps.dsirSelect(
        docs, target, 100, "doc_id", "text", 1024).count()
    }
    spark.stop()
  }
}
