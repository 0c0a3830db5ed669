package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the kernel-family codegen decision (VERDICT r11 #3):
  * times the narrow MinHash signature→band-key stage — the hottest
  * kernel surrounded by genuinely codegen-able work (regexp
  * tokenization before it, md5/concat_ws band keys after it) — at an
  * amplification factor, several repetitions, and reports the
  * executed plan's WholeStageCodegen span count plus whether the
  * kernel's projection sits inside one.
  *
  * Run once with [[graft.functions.MinhashSig]] as CodegenFallback
  * (breaks the enclosing stage out of WSCG) and once with its
  * static-invoke `doGenCode` (stage stays fused); BENCH_NOTES records
  * both. The chain deliberately stops before the band self-join: the
  * exchange would dominate and mask the per-row effect under test.
  *
  * Usage: `runMain graft.tools.MinhashCodegenProbe [sfDir] [factor] [reps]`
  * (defaults `/root/testdata/sf0.1`, 100, 3).
  */
object MinhashCodegenProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The ScaleSmoke amplification protocol: fused per-copy token
    // markers, synthesis cost excluded via serialized checkpoint.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .withColumn("copy", explode(sequence(lit(0), lit(factor - 1))))
      .select((col("doc_id") * factor + col("copy")).as("doc_id"),
        expr("regexp_replace(regexp_replace(lower(text), " +
          "'[^a-z0-9]+', ' '), '([a-z0-9]+)', '$1q' || copy)")
          .as("text"))
      .localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

    val bands = 8; val rows = 2; val k = 3
    def chain: DataFrame = {
      val sig = graft.text.DedupOps.minhashSignatures(
        docs, "doc_id", "text", k, bands * rows)
      sig.select(col("id"), explode(array(
          (0 until bands).map { b =>
            struct(lit(b).as("band"),
              md5(concat_ws(",", (0 until rows).map(r =>
                col(s"h${b * rows + r}").cast("string")): _*)).as("key"))
          }: _*)).as("bk"))
        .select(col("id"), col("bk.band"), col("bk.key"))
        .agg(count(lit(1)).as("n"),
          sum(crc32(col("key"))).as("chk"))
    }

    (1 to reps).foreach { i =>
      val c = chain
      val t0 = System.nanoTime()
      val row = c.collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      // Inspect AFTER execution: under AQE the pre-execution plan
      // string shows query stages before codegen insertion, so WSCG
      // spans are only visible in the final executed plan.
      val plan = c.queryExecution.executedPlan.toString
      val wscg = "\\*\\(\\d+\\)".r.findAllIn(plan).length
      val kernelFused = plan.linesIterator
        .exists(l => l.contains("minhash_sig") && l.contains("*("))
      println(f"""{"probe":"minhash_sig_chain","factor":$factor,""" +
        f""""rep":$i,"sec":$sec%.2f,"rows":${row.getLong(0)},""" +
        f""""chk":${row.getLong(1)},"wscg_spans":$wscg,""" +
        f""""kernel_in_wscg":$kernelFused}""")
    }
    spark.stop()
  }
}
