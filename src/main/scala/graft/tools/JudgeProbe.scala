package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary judge probe: decompose q88/q89/q91 wall time. */
object JudgeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"JPROBE $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("q88_perplexity_count") {
      graft.text.LmOps.perplexity(
        docs, docs.filter(pmod(col("doc_id"), lit(10)) < 3),
        "doc_id", "text").count()
    }
    time("q91_ppl_checkpoint_only") {
      graft.text.LmOps.perplexity(
        docs, docs.filter(pmod(col("doc_id"), lit(10)) < 3),
        "doc_id", "text").localCheckpoint(true).count()
    }
    time("q91_full_buckets") {
      graft.text.LmOps.perplexityBuckets(
        docs, docs.filter(pmod(col("doc_id"), lit(10)) < 3),
        "doc_id", "text").count()
    }
    time("q89_weights_only") {
      graft.text.DsirOps.importanceWeights(
        docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", buckets = 256).count()
    }
    time("q89_full_select") {
      graft.text.DsirOps.dsirSelect(
        docs, docs.filter(col("lang") === "en"), k = 100,
        idCol = "doc_id", textCol = "text", buckets = 256).count()
    }
    time("q89_featurecounts_only") {
      graft.text.DsirOps.hashedNgramCounts(
        docs, "doc_id", "text", 256, 7).count()
    }
    time("q92_winnow_fp") {
      graft.text.DedupOps
        .winnowFingerprints(docs, "doc_id", "text").count()
    }
    time("q76_image_decode") {
      graft.SparkEntry.queries("q76_image_decode")(spark, dir).count()
    }
    time("q76_image_decode_rerun") {
      graft.SparkEntry.queries("q76_image_decode")(spark, dir).count()
    }
    spark.stop()
  }
}
