package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B evidence for the bounded top-k aggregate (VERDICT r15 ask #1):
  * the retrieval family's per-query cut as a `row_number() OVER
  * (PARTITION BY q_id ...)` window (the r15 shape) versus the
  * [[graft.functions.TopK]] bounded-heap aggregate (the shipped
  * shape), run on the SAME scored frame at the f100 amplification,
  * with the actual shuffle-write record/byte counts captured from
  * stage metrics — the window form must shuffle every (query,
  * candidate) scored row, the aggregate at most |Q|·k per map
  * partition.
  *
  * Probes the two operators the VERDICT named: exact cosine
  * brute-force ([[graft.sim.Similarity.bruteForceTopK]]'s scored
  * frame) and binary Hamming ranking
  * ([[graft.sim.HammingOps.hammingTopK]]'s). Both forms' results are
  * cross-checked exactly (two-sided `except`) before the numbers are
  * reported.
  *
  * Usage: `runMain graft.tools.TopKShuffleProbe [sfDir] [factor] [k]`
  * (defaults `/root/testdata/sf0.1`, 100, 10). Output: one JSON line
  * per (operator, form). Committed output lands in BENCH_NOTES.md. */
object TopKShuffleProbe {

  /** Accumulates shuffle WRITE volume across completed stages —
    * records written is exactly the row count moved by exchanges. */
  private final class ShuffleTally extends SparkListener {
    val records = new AtomicLong
    val bytes = new AtomicLong
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
      val m = ev.stageInfo.taskMetrics
      if (m != null) {
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  private def measure(spark: SparkSession, label: String,
      df: => DataFrame): (Long, Double, Long, Long) = {
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    val t0 = System.nanoTime()
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    // the listener bus is async; give completed-stage events time to
    // drain before reading the tallies (probe-grade, not product)
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(tally)
    val (rec, by) = (tally.records.get, tally.bytes.get)
    println(f"""{"probe":"topk_shuffle","op":"$label",""" +
      f""""rows":$n,"sec":$sec%.2f,"shuffle_records":$rec,""" +
      f""""shuffle_mb":${by / 1e6}%.1f}""")
    (n, sec, rec, by)
  }

  /** The r15 window form, verbatim: row_number over (q_id), then
    * rank <= k. */
  private def windowCut(scored: DataFrame, k: Int, sortKey: Column,
      valCol: String): DataFrame = {
    val w = Window.partitionBy("q_id")
      .orderBy(sortKey.asc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("int").as("rank"),
        col("n_id"), col(valCol))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the RecallSweep/SimScaleSmoke amplification
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
      .withColumn("copy", explode(sequence(lit(0), lit(factor - 1))))
      .select((col("vec_id") * factor + col("copy")).as("vec_id"),
        when(col("copy") === 0, col("embedding")).otherwise(
          expr("transform(embedding, (x, i) -> " +
            "x * cast(1 - 2 * pmod(hash(copy, i), 2) as float))"))
          .as("embedding"))
      .repartition(math.max(1,
        spark.sessionState.conf.numShufflePartitions))
      .localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nRows = emb.count()
    val queries = emb.filter(pmod(col("vec_id"), lit(factor)) === 0 &&
      col("vec_id") < 200L * factor)
      .localCheckpoint(eager = true)
    val nq = queries.count()
    println(s"""{"setup":"topk_shuffle","rows":$nRows,""" +
      s""""queries":$nq,"k":$k,"factor":$factor}""")

    // ---- brute-force cosine ----
    // the bruteForceTopK scored frame, inlined so both cuts see the
    // IDENTICAL input (same broadcast join, same rounding)
    def dot(x: Column, y: Column) = graft.functions.ArrayDot.dot(x, y)
    val p = math.pow(10.0, 6)
    val q = queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_vec"))
      .withColumn("q_norm", sqrt(dot(col("q_vec"), col("q_vec"))))
    val c = emb.select(col("vec_id").as("n_id"),
        col("embedding").as("n_vec"))
      .withColumn("n_norm", sqrt(dot(col("n_vec"), col("n_vec"))))
    def cosScored = broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("cos",
        floor(when(col("q_norm") > 0.0 && col("n_norm") > 0.0,
          dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
          * p + 0.5) / p)
      .select("q_id", "n_id", "cos")
    val cosKey = coalesce(-col("cos"), lit(Double.PositiveInfinity))
    measure(spark, "cosine_window",
      windowCut(cosScored, k, cosKey, "cos"))
    measure(spark, "cosine_topk_agg",
      graft.functions.TopK.perQueryCut(cosScored, k, cosKey, "cos"))
    val cosDiff =
      windowCut(cosScored, k, cosKey, "cos")
        .except(graft.functions.TopK.perQueryCut(cosScored, k, cosKey,
          "cos")).count() +
      graft.functions.TopK.perQueryCut(cosScored, k, cosKey, "cos")
        .except(windowCut(cosScored, k, cosKey, "cos")).count()
    println(s"""{"probe":"topk_shuffle","op":"cosine","diff":$cosDiff}""")

    // ---- Hamming-48 ----
    val enc = graft.sim.HammingOps.encode(emb, "vec_id", "embedding")
      .localCheckpoint(eager = true)
    val hq = queries.select(col("vec_id").cast("long").as("q_id"),
      graft.sim.HammingOps.signature(col("embedding"), 48, 64, 42L)
        .as("__qsig"))
    val hc = enc.select(col("vec_id").cast("long").as("n_id"),
      col("sig").as("__nsig"))
    def hamScored = broadcast(hq).join(hc, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        bit_count(col("__qsig").bitwiseXOR(col("__nsig")))
          .cast("int").as("hdist"))
    measure(spark, "hamming_window",
      windowCut(hamScored, k, col("hdist"), "hdist"))
    measure(spark, "hamming_topk_agg",
      graft.functions.TopK.perQueryCut(hamScored, k, col("hdist"),
        "hdist"))
    val hamDiff =
      windowCut(hamScored, k, col("hdist"), "hdist")
        .except(graft.functions.TopK.perQueryCut(hamScored, k,
          col("hdist"), "hdist")).count() +
      graft.functions.TopK.perQueryCut(hamScored, k, col("hdist"),
        "hdist").except(windowCut(hamScored, k, col("hdist"),
          "hdist")).count()
    println(s"""{"probe":"topk_shuffle","op":"hamming","diff":$hamDiff}""")
    spark.stop()
  }
}
