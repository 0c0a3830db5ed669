package graft.tools

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{FileInfo, TableMeta, VariableMeta}
import graft.pipeline.FastData

/** Factor smoke for the fast-data volume path (E4: S9 TOB3 decode →
  * A14 window partitioning → K1 TOA5 shard write — ref
  * `code/utils/fast_file_io.py:444-596`): synthesizes N daily TOB3
  * files (default 864,000 records each — a 10 Hz logger day in
  * 64-record major frames) and drives the whole chain at factor 1 vs
  * factor N, recording wall seconds, decoded rows, shard files
  * written, plan Exchange counts, and task/GC seconds.
  *
  * What must hold at scale: the DSv2 scan is file-parallel (one
  * partition per logger file, so N files = N-way decode with no
  * driver involvement), `windowStats` is one partial-aggregated
  * groupBy on the window key, and `writeShards` runs ONE shuffle and
  * ONE write job regardless of window count. So wall should scale
  * far sublinearly with N on a 32-core box until N exceeds core
  * count, exchange counts must be factor-invariant, and shard count
  * must scale exactly linearly (48 half-hour shards per day).
  *
  * Usage: `runMain graft.tools.FastDataScaleSmoke [factor] [rowsPerDay]`
  * (defaults 100, 864000). Files land under /tmp/graft_fastsmoke.
  */
object FastDataScaleSmoke {

  private final class StageMetrics extends SparkListener {
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        taskMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
      }
    }
  }

  private val RecsPerFrame = 64
  private val RecSize = 6                       // IEEE4 + FP2
  private val FrameSize = 12 + RecsPerFrame * RecSize + 4

  /** One synthetic daily TOB3 file: `rows` records at 10 Hz from
    * 2024-01-01 + dayIdx, major frames only, valid stamps — the
    * exact byte grammar `Tob.decodeTob3` documents. */
  private def writeTob3Day(path: java.nio.file.Path, dayIdx: Int,
      rows: Int): Unit = {
    require(rows % RecsPerFrame == 0, s"rows=$rows not a frame multiple")
    def q(fields: String*): String =
      fields.map(f => "\"" + f + "\"").mkString(",")
    val header = Seq(
      q("TOB3", "Site", "CR3000", "1", "os", "prog", "99"),
      q("fast", "100 MSEC", FrameSize.toString, rows.toString,
        "43981", "Sec100Usec"),
      q("Ux", "Ts"),
      q("m/s", "degC"),
      q("Smp", "Smp"),
      q("IEEE4", "FP2")
    ).mkString("", "\r\n", "\r\n").getBytes(StandardCharsets.US_ASCII)
    val day0Sec = java.time.LocalDate.of(2024, 1, 1).plusDays(dayIdx)
      .atStartOfDay.toEpochSecond(java.time.ZoneOffset.UTC) -
      java.time.LocalDate.of(1990, 1, 1)
        .atStartOfDay.toEpochSecond(java.time.ZoneOffset.UTC)
    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(path), 1 << 20)
    try {
      out.write(header)
      val buf = ByteBuffer.allocate(FrameSize)
      val nFrames = rows / RecsPerFrame
      var fr = 0
      while (fr < nFrames) {
        buf.clear()
        val startTenths = fr.toLong * RecsPerFrame  // 100 ms units
        buf.order(ByteOrder.LITTLE_ENDIAN)
        buf.putInt((day0Sec + startTenths / 10).toInt)
        buf.putInt(((startTenths % 10) * 1000).toInt) // 100 us units
        buf.putInt(dayIdx * rows + fr * RecsPerFrame) // begRecord
        var i = 0
        while (i < RecsPerFrame) {
          val rec = fr * RecsPerFrame + i
          buf.order(ByteOrder.LITTLE_ENDIAN)
            .putFloat((rec % 1000) * 0.01f - 5.0f)
          // FP2 big-endian, exponent 0: value = mantissa (0..1999)
          buf.order(ByteOrder.BIG_ENDIAN)
            .putShort((rec % 2000).toShort)
          i += 1
        }
        buf.order(ByteOrder.LITTLE_ENDIAN)
        buf.putShort(0.toShort)        // word0 = 0: major frame
        buf.putShort(43981.toShort)    // validation stamp
        out.write(buf.array(), 0, FrameSize)
        fr += 1
      }
    } finally out.close()
  }

  private def exchanges(df: DataFrame): Int =
    "(?i)exchange".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val rowsPerDay = args.lift(1).map(_.toInt).getOrElse(864000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new StageMetrics
    spark.sparkContext.addSparkListener(metrics)

    val meta = TableMeta(FileInfo.dummy, Seq(
      VariableMeta("TIMESTAMP", "TS", ""),
      VariableMeta("RECORD", "RN", ""),
      VariableMeta("Ux", "m/s", "Smp"),
      VariableMeta("Ts", "degC", "Smp")))

    Seq(1, factor).foreach { f =>
      val inDir = Paths.get(s"/tmp/graft_fastsmoke/in_f$f")
      val outDir = Paths.get(s"/tmp/graft_fastsmoke/out_f$f")
      def rmTree(p: java.nio.file.Path): Unit = if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(q => Files.deleteIfExists(q))
      rmTree(inDir); rmTree(outDir)
      Files.createDirectories(inDir)
      val tSynth = System.nanoTime()
      (0 until f).foreach { d =>
        writeTob3Day(inDir.resolve(f"day$d%03d.dat"), d, rowsPerDay)
      }
      val synthSec = (System.nanoTime() - tSynth) / 1e9
      val inBytes = Files.list(inDir).toArray.map(p =>
        Files.size(p.asInstanceOf[java.nio.file.Path])).sum

      def timed(phase: String)(body: => (Long, Int)): Unit = {
        val tm0 = metrics.taskMs.get(); val g0 = metrics.gcMs.get()
        val t0 = System.nanoTime()
        val (n, exch) = body
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"phase":"$phase","factor":$f,"sec":$sec%.1f,""" +
          f""""n":$n,"exchanges":$exch,""" +
          f""""task_sec":${(metrics.taskMs.get() - tm0) / 1e3}%.1f,""" +
          f""""gc_sec":${(metrics.gcMs.get() - g0) / 1e3}%.1f}""")
      }

      println(f"""{"phase":"synth","factor":$f,"sec":$synthSec%.1f,""" +
        f""""files":$f,"mb":${inBytes >> 20}}""")
      val df = spark.read.format("tob").load(inDir.toString)
      timed("decode_windowStats") {
        val ws = FastData.windowStats(
          df.select(col("DATETIME")), "DATETIME", 30, 10.0)
        val total = ws.agg(sum(col("n_rows"))).collect()(0).getLong(0)
        (total, exchanges(ws))
      }
      timed("shard_write") {
        val names = FastData.writeShards(
          df, meta, "DATETIME", 30, outDir.toString, "Site_fast")
        (names.length.toLong, -1)
      }
      val outBytes = Files.list(outDir).toArray.map(p =>
        Files.size(p.asInstanceOf[java.nio.file.Path])).sum
      println(f"""{"phase":"out","factor":$f,""" +
        f""""shard_mb":${outBytes >> 20}}""")
    }
    spark.stop()
  }
}
