package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for the fused tokenizer kernel (VERDICT r16 ask #2): the
  * [[graft.functions.Tokenize]] kernel vs the relational chain it
  * replaced (`array_remove(split(regexp_replace(lower …)))`), over an
  * amplified `documents` table at factor N — the same corpus shape
  * the f100 smokes named tokenizer-bound. Three passes per form:
  * (a) tokenize + explode + count (the MG/vocab shape), (b)
  * token-count aggregate (the budget/pack shape), (c) hash parity of
  * the exploded stream (the A and B forms must agree bit-for-bit at
  * full scale, not just in the unit specs). Wall seconds + summed
  * executor task-time per pass.
  *
  * Usage: `runMain graft.tools.TokenizeProbe [sfDir] [factor] [reps]`
  */
object TokenizeProbe {

  private final class StageMetrics extends SparkListener {
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) taskMs.addAndGet(m.executorRunTime)
    }
  }

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
    val metrics = new StageMetrics
    spark.sparkContext.addSparkListener(metrics)

    // copy markers appended per token keep the text realistic while
    // making copies distinct (the TextScaleSmoke convention)
    val amplified: DataFrame = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .withColumn("copy", explode(sequence(lit(0), lit(factor - 1))))
      .select((col("doc_id") * factor + col("copy")).as("doc_id"),
        expr("regexp_replace(regexp_replace(lower(text), " +
          "'[^a-z0-9]+', ' '), '([a-z0-9]+)', '$1q' || copy)")
          .as("text"))
      .localCheckpoint(true) // stage the input so the A/B times ONLY
                             // the tokenize pass, not the amplifier

    import org.apache.spark.sql.Column
    val fused: Column => Column = graft.functions.Tokenize.tokens
    val rel: Column => Column = graft.text.TextOps.tokensRelational

    def timed(tag: String)(mk: => Long): Unit = {
      (1 to reps).foreach { i =>
        val tm0 = metrics.taskMs.get()
        val t0 = System.nanoTime()
        val n = mk
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"$tag%s","rep":$i,"sec":$sec%.2f,""" +
          f""""rows":$n,"task_sec":${(metrics.taskMs.get() - tm0) / 1000}}""")
      }
    }

    for ((tag, tok) <- Seq("fused" -> fused, "relational" -> rel)) {
      timed(s"explode_count:$tag") {
        amplified.select(explode(tok(col("text"))).as("t"))
          .filter(length(col("t")) > 2).count()
      }
      timed(s"token_count_sum:$tag") {
        amplified.agg(sum(size(tok(col("text"))))).head().getLong(0)
      }
    }
    // kernel-only tokenCount (no array materialization at all)
    timed("token_count_fusedcnt") {
      amplified.agg(sum(graft.functions.Tokenize.tokenCount(col("text"))
        .cast("long"))).head().getLong(0)
    }
    // full-scale parity: order-independent sum of per-(doc,pos,token)
    // hashes -- commutative, so no driver-side collect of the stream
    def streamHash(tok: Column => Column): Long =
      amplified.select(col("doc_id"),
          posexplode(tok(col("text"))).as(Seq("p", "t")))
        .agg(sum(conv(substring(md5(concat_ws(":", col("doc_id"),
          col("p"), col("t"))), 1, 8), 16, 10).cast("long")))
        .head().getLong(0)
    val hf = streamHash(fused); val hr = streamHash(rel)
    println(s"""{"probe":"parity","fused":$hf,"relational":$hr,""" +
      s""""equal":${hf == hr}}""")
    spark.stop()
  }
}
