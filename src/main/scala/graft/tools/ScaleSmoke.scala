package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-command scale smoke for the packing/dedup chain: amplify the
  * sf0.1 `documents` table by an integer factor and run
  * `packBlocks` + `ngramJaccardPairs` + `connectedComponents` at both
  * factor 1 and factor N, recording per-phase wall time, shuffle
  * read/write bytes, result partition counts, peak persisted storage,
  * and the physical-plan Exchange count — the evidence that the
  * operators' plan SHAPE is scale-invariant (same exchanges at N× the
  * data) and that no hidden driver bottleneck appears off the test SF.
  *
  * Amplification keeps the near-dup structure of the base corpus
  * without manufacturing a pathological one: the text is normalized
  * (the tokenizer's own alphabet) and every token is suffixed with
  * `q<copy>` — fused INTO the token, so the suffix survives
  * tokenization and shingles never collide ACROSS copies. Pair and
  * component counts then scale exactly linearly in the factor
  * (reported), and posting-list lengths stay at their base-corpus
  * values rather than multiplying into a quadratic blow-up that no
  * real corpus has. (A space-adjacent marker is NOT enough: anything
  * the normalizer maps to a separator becomes its own token between
  * every pair of words, and a shared single word then yields a shared
  * shingle — the first draft of this harness produced a 4700× pair
  * explosion at factor 10 exactly that way.) Factor 1 runs the SAME
  * synthesis with copy=0, so the two corpora are isomorphic.
  *
  * Usage: `runMain graft.tools.ScaleSmoke [sfDir] [factor]`
  * (defaults `/root/testdata/sf0.1`, 100). Emits one JSON line per
  * (phase, factor) plus a summary comparing Exchange counts.
  */
object ScaleSmoke {

  private final class StageMetrics extends SparkListener {
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val nStages = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      nStages.incrementAndGet()
      if (m != null) {
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        taskMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
      }
    }
  }

  private def exchanges(df: DataFrame): Int =
    "(?i)exchange".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      // Diagnostic headroom, NOT a fix: the 1 GB default exists to
      // catch accidental driver-side collection, and a factor-1000
      // run tripped it inside the ngram chain. Raising it here lets
      // the run complete so the per-phase `joins` line below shows
      // WHICH strategy shipped data to the driver — a
      // BroadcastHashJoin on a corpus-derived side in that line is a
      // finding, never something this setting may hide.
      .config("spark.driver.maxResultSize",
        sys.env.getOrElse("SPARK_GRAFT_MAX_RESULT", "8g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new StageMetrics
    spark.sparkContext.addSparkListener(metrics)

    // Normalize with the tokenizer's own alphabet, then fuse `q<copy>`
    // into every token ($1 backref keeps it inside the alnum run).
    def amplified(f: Int): DataFrame =
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
        .withColumn("copy", explode(sequence(lit(0), lit(f - 1))))
        .select((col("doc_id") * f + col("copy")).as("doc_id"),
          expr("regexp_replace(regexp_replace(lower(text), " +
            "'[^a-z0-9]+', ' '), '([a-z0-9]+)', '$1q' || copy)")
            .as("text"))

    case class Reading(phase: String, f: Int, sec: Double, rows: Long,
        parts: Int, exch: Int, shufWriteMb: Long, shufReadMb: Long,
        storageMb: Long)
    val readings = scala.collection.mutable.ArrayBuffer.empty[Reading]

    // Times CONSTRUCTION + count: packOffsets and ngramJaccardPairs
    // run eager internal materializations at call time, so the work
    // must happen inside the clock, not before it. `mk` returns
    // (result, planFrame): the Exchange count comes from planFrame
    // (planning only, no re-execution) so a checkpointed result can
    // still report its real pipeline shape.
    def timed(phase: String, f: Int)
        (mk: => (DataFrame, DataFrame)): DataFrame = {
      val w0 = metrics.shufWrite.get(); val r0 = metrics.shufRead.get()
      val s0 = metrics.nStages.get(); val tm0 = metrics.taskMs.get()
      val g0 = metrics.gcMs.get()
      val t0 = System.nanoTime()
      val (df, planDf) = mk
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // EXECUTED join strategies (post-AQE): the planning-time count
      // can't see runtime broadcast conversions, and a broadcast of a
      // corpus-derived side is exactly the 100 TB failure this smoke
      // hunts — surface it per phase.
      val executed = planDf.queryExecution.executedPlan.toString
      def joins(s: String): String = Seq(
        "BroadcastHashJoin" -> "bhj", "SortMergeJoin" -> "smj",
        "ShuffledHashJoin" -> "shj", "BroadcastNestedLoopJoin" -> "bnlj")
        .map { case (k, a) => s"$a=${k.r.findAllIn(s).length}" }
        .mkString(",")
      println(s"""{"phase":"$phase","factor":$f,""" +
        s""""joins":"${joins(executed)}"}""")
      val storage = spark.sparkContext.getRDDStorageInfo
        .map(i => i.memSize + i.diskSize).sum
      val rd = Reading(phase, f, sec, n, df.rdd.getNumPartitions,
        exchanges(planDf),
        (metrics.shufWrite.get() - w0) >> 20,
        (metrics.shufRead.get() - r0) >> 20, storage >> 20)
      readings += rd
      println(f"""{"phase":"$phase","factor":$f,"sec":${rd.sec}%.1f,""" +
        f""""rows":$n,"parts":${rd.parts},"exchanges":${rd.exch},""" +
        f""""shuf_write_mb":${rd.shufWriteMb},"shuf_read_mb":${rd.shufReadMb},""" +
        f""""peak_storage_mb":${rd.storageMb},""" +
        f""""stages":${metrics.nStages.get() - s0},""" +
        f""""task_sec":${(metrics.taskMs.get() - tm0) / 1e3}%.1f,""" +
        f""""gc_sec":${(metrics.gcMs.get() - g0) / 1e3}%.1f}""")
      df
    }

    Seq(1, factor).foreach { f =>
      // synthesis cost out of phase timings; SERIALIZED storage — at
      // factor 100 the full amplified text held as row objects is
      // itself a meaningful slice of a local JVM's heap
      val docs = amplified(f).localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val counts = docs.select(col("doc_id"),
        graft.text.TextOps.tokenCount(col("text")).cast("long")
          .as("n_tokens"))
      timed("packBlocks", f) {
        val b = graft.text.PackOps.packBlocks(counts, "doc_id",
          "n_tokens", 256, "sm")
        (b, b)
      }
      val pairs = timed("ngramJaccardPairs", f) {
        val raw = graft.text.DedupOps.ngramJaccardPairs(docs, "doc_id",
          "text", 3, 0.2)
        (raw.localCheckpoint(eager = true), raw)
      }
      val nodes = docs.select(col("doc_id").as("id"))
      timed("connectedComponents", f) {
        val cc = graft.text.DedupOps.connectedComponents(nodes, pairs)
        (cc, cc)
      }
      // window hashes carry the fused copy marker, so dup spans are
      // strictly within-copy and span rows scale exactly linearly
      timed("dupSpans", f) {
        val ds = graft.text.DedupOps.dupSpans(docs, 8, 2)
        (ds.localCheckpoint(eager = true), ds)
      }
      graft.text.PackOps.releaseSubstrates()
      spark.catalog.clearCache()
    }

    // Scale-shape assertions: identical exchange counts, and linear
    // row scaling for every phase (the salted amplification makes the
    // expected counts exact multiples, modulo block-boundary rounding
    // for packBlocks).
    readings.groupBy(_.phase).foreach { case (phase, rs) =>
      val byF = rs.map(r => r.f -> r).toMap
      val b = byF(1); val big = byF(factor)
      val exchOk = b.exch == big.exch
      val ratio = big.rows.toDouble / b.rows
      println(f"""{"summary":"$phase","exchanges_base":${b.exch},""" +
        f""""exchanges_scaled":${big.exch},"exch_invariant":$exchOk,""" +
        f""""row_ratio":$ratio%.3f,"factor":$factor}""")
    }
    spark.stop()
  }
}
