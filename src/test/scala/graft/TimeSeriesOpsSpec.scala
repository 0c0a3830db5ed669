package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.TimeSeriesOps

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("regularize fills missing grid rows with nulls and keeps ints (A1)") {
    val df = Seq(
      (ts("2024-01-01 00:30:00"), 1L, 1.0),
      (ts("2024-01-01 01:00:00"), 2L, 2.0),
      // 01:30 missing
      (ts("2024-01-01 02:00:00"), 4L, 4.0)
    ).toDF("DATETIME", "n", "v")
    val out = TimeSeriesOps.regularize(df, "DATETIME", 1800)
      .orderBy("DATETIME")
    assert(out.count() == 4)
    val gap = out.filter($"DATETIME" === ts("2024-01-01 01:30:00")).head()
    assert(gap.isNullAt(gap.fieldIndex("n")))
    // Int column must stay integral, not silently widen to double
    assert(out.schema("n").dataType.typeName == "long")
  }

  test("interval inference returns mode and min (A2)") {
    val base = ts("2024-01-01 00:00:00").getTime
    val times = Seq(0, 30, 60, 90, 150, 180).map(m =>
      new Timestamp(base + m * 60000L))
    val df = times.map(t => (t, 1.0)).toDF("DATETIME", "v")
    val (mode, min) = TimeSeriesOps.inferIntervalSeconds(df, "DATETIME")
    assert(mode == 1800L && min == 1800L)
    // min != mode case: caller-enforced policy has the data to raise
    val irregular = (times :+ new Timestamp(base + 181 * 60000L))
      .map(t => (t, 1.0)).toDF("DATETIME", "v")
    val (m2, min2) = TimeSeriesOps.inferIntervalSeconds(irregular, "DATETIME")
    assert(m2 == 1800L && min2 == 60L && m2 != min2)
  }

  test("gaps reports bounds and record counts (A6/A7)") {
    val rows = Seq("00:30", "01:00", "03:00", "03:30", "06:30").map(t =>
      (ts(s"2024-01-01 $t:00"), 1.0)).toDF("DATETIME", "v")
    val g = TimeSeriesOps.gaps(rows, "DATETIME", 1800)
      .orderBy("prev_ts").collect()
    assert(g.length == 2)
    assert(g(0).getAs[Long]("n_records") == 3) // 01:00 -> 03:00
    assert(g(1).getAs[Long]("n_records") == 5) // 03:30 -> 06:30
  }

  test("keyless interval/gaps match the keyed single-group answer " +
      "across many range partitions (A2/A6 distributed path)") {
    // A stream long enough to span every shuffle partition, with
    // duplicates (distinct semantics), a sub-interval straggler, and
    // gaps placed so some MUST straddle range-partition boundaries.
    val base = ts("2024-01-01 00:00:00").getTime
    val mins = (0 until 2000).filterNot(i => i % 97 == 0).map(_ * 30) ++
      Seq(30, 60, 90) /* duplicates */ :+ (7 * 30 + 1) /* straggler */
    val df = mins.map(m => (new Timestamp(base + m * 60000L), 1.0))
      .toDF("DATETIME", "v")
    // Keyed single-group = the old global-window semantics.
    val keyed = df.withColumn("k", lit(1))
    val hKeyless = TimeSeriesOps.intervalHistogram(df, "DATETIME")
      .orderBy("delta_sec").collect().map(r => (r.getLong(0), r.getLong(1)))
    val hKeyed = TimeSeriesOps.intervalHistogram(keyed, "DATETIME", Seq("k"))
      .orderBy("delta_sec").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hKeyless.toSeq == hKeyed.toSeq)
    assert(hKeyless.map(_._2).sum == df.select("DATETIME").distinct().count() - 1)
    val gKeyless = TimeSeriesOps.gaps(df, "DATETIME", 1800)
      .orderBy("prev_ts").collect()
      .map(r => (r.getTimestamp(1), r.getTimestamp(0), r.getAs[Long]("n_records")))
    val gKeyed = TimeSeriesOps.gaps(keyed, "DATETIME", 1800, Seq("k"))
      .orderBy("prev_ts").collect()
      .map(r => (r.getTimestamp(2), r.getTimestamp(1), r.getAs[Long]("n_records")))
    assert(gKeyless.toSeq == gKeyed.toSeq)
    assert(gKeyless.nonEmpty)
    // the physical plan must not contain a global (keyless) window
    val plan = TimeSeriesOps.intervalHistogram(df, "DATETIME")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"keyless path still uses a window:\n$plan")
  }

  test("keyless islands/sessionize match the keyed single-group answer " +
      "across many range partitions (J5 distributed path)") {
    // Labels arranged so runs MUST span range-partition boundaries,
    // including one long run covering many partitions, plus
    // single-record islands and session gaps at varied places.
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (0 until 3000).map { i =>
      val label =
        if (i < 1200) "LONG" // one run spanning many partitions
        else if (i % 7 == 0) s"S$i" // singleton islands
        else if ((i / 50) % 2 == 0) "A" else "B"
      // gap pattern: every 97th step jumps 4 h (session break at 1 h)
      val mins = i * 30 + (i / 97) * 240
      (new Timestamp(base + mins * 60000L), label)
    }
    val df = rows.toDF("DATETIME", "inst")
    val keyed = df.withColumn("k", lit(1))

    val iKeyless = TimeSeriesOps.islands(df, "DATETIME", "inst")
      .orderBy("start_ts").collect()
      .map(r => (r.getAs[String]("inst"), r.getTimestamp(1),
        r.getTimestamp(2), r.getAs[Long]("n_records")))
    val iKeyed = TimeSeriesOps.islands(keyed, "DATETIME", "inst", Seq("k"))
      .orderBy("start_ts").collect()
      .map(r => (r.getAs[String]("inst"), r.getAs[java.sql.Timestamp]("start_ts"),
        r.getAs[java.sql.Timestamp]("end_ts"), r.getAs[Long]("n_records")))
    assert(iKeyless.length == iKeyed.length)
    assert(iKeyless.toSeq == iKeyed.toSeq)
    assert(iKeyless.exists(_._4 > 1000)) // the cross-partition run survived

    val sKeyless = TimeSeriesOps.sessionize(df, "DATETIME", 3600)
      .orderBy("DATETIME").collect()
      .map(r => (r.getTimestamp(0), r.getAs[Long]("session_id")))
    val sKeyed = TimeSeriesOps.sessionize(keyed, "DATETIME", 3600, Seq("k"))
      .orderBy("DATETIME").collect()
      .map(r => (r.getTimestamp(0), r.getAs[Long]("session_id")))
    assert(sKeyless.toSeq == sKeyed.toSeq)
    assert(sKeyless.last._2 > 1) // multiple sessions actually formed
    // no global window in either keyless plan
    val plans = Seq(
      TimeSeriesOps.islands(df, "DATETIME", "inst"),
      TimeSeriesOps.sessionize(df, "DATETIME", 3600))
      .map(_.queryExecution.executedPlan.toString)
    plans.foreach(p =>
      assert(!p.contains("Window"), s"keyless path still uses a window:\n$p"))
  }

  test("keyless sessionize: reliable checkpoint variant matches the " +
      "default, and null timestamps drop identically on both") {
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (0 until 500).map { i =>
      (new Timestamp(base + (i * 30 + (i / 97) * 240) * 60000L), i)
    }
    val df = rows.toDF("DATETIME", "v")
    val withNulls = df.unionByName(
      Seq((null.asInstanceOf[Timestamp], -1),
          (null.asInstanceOf[Timestamp], -2)).toDF("DATETIME", "v"))
    val expected = TimeSeriesOps.sessionize(df, "DATETIME", 3600)
      .orderBy("v").collect().map(r => (r.getInt(1), r.getLong(2)))

    // violated non-null precondition: null rows drop, the rest label
    // identically (the drop is observed and warned, not silent)
    val dropped = TimeSeriesOps.sessionize(withNulls, "DATETIME", 3600)
      .orderBy("v").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(dropped.toSeq == expected.toSeq)

    // reliable checkpoint path writes to the checkpoint dir and returns
    // the same labeling
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    val reliable = TimeSeriesOps.sessionize(df, "DATETIME", 3600,
        reliableCheckpoint = true)
      .orderBy("v").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(reliable.toSeq == expected.toSeq)
  }

  test("duplicate-key diagnostics flags only multi-row keys (D2)") {
    val df = Seq((1, "a"), (1, "b"), (2, "a")).toDF("k", "p")
    val d = TimeSeriesOps.duplicateKeyDiagnostics(df, Seq("k"), "p").collect()
    assert(d.length == 1 && d(0).getInt(0) == 1
      && d(0).getAs[Long]("n_distinct") == 2)
  }

  test("maskRange masks to null without dropping rows (P5)") {
    val df = Seq(1.0, 5.0, 50.0).toDF("v")
      .withColumn("m", TimeSeriesOps.maskRange(col("v"), 2.0, 10.0))
    assert(df.count() == 3)
    assert(df.filter(col("m").isNotNull).count() == 1)
  }

  test("islands coalesces consecutive equal labels (J5)") {
    val df = Seq(
      (ts("2024-01-01 00:00:00"), "A"),
      (ts("2024-01-01 01:00:00"), "A"),
      (ts("2024-01-01 02:00:00"), "B"),
      (ts("2024-01-01 03:00:00"), "A")
    ).toDF("DATETIME", "inst")
    val out = TimeSeriesOps.islands(df, "DATETIME", "inst")
      .orderBy("start_ts").collect()
    assert(out.map(_.getAs[String]("inst")).toSeq == Seq("A", "B", "A"))
    assert(out(0).getAs[Long]("n_records") == 2)
  }

  test("strict-sum semantics via endLabel helper (A11/#4)") {
    val lbl = TimeSeriesOps.endLabel(lit(ts("2024-01-01 00:00:00")), 1800)
    val v = spark.range(1).select(lbl.as("t")).head().getTimestamp(0)
    assert(v == ts("2024-01-01 00:30:00"))
  }

  test("requireUniformInterval enforces min == mode (A2 policy)") {
    val good = Seq(
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:05:00"),
      ts("2024-01-01 00:10:00"), ts("2024-01-01 00:15:00")
    ).toDF("DATETIME")
    assert(TimeSeriesOps.requireUniformInterval(good, "DATETIME") == 300L)
    // one sub-interval straggler: min (60s) != mode (300s) -> raise,
    // like the reference's file_io.py:1079-1087
    val bad = Seq(
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:05:00"),
      ts("2024-01-01 00:10:00"), ts("2024-01-01 00:15:00"),
      ts("2024-01-01 00:16:00")
    ).toDF("DATETIME")
    val e = intercept[IllegalArgumentException] {
      TimeSeriesOps.requireUniformInterval(bad, "DATETIME")
    }
    assert(e.getMessage.contains("modal interval"))
    // the L1 condition path infers-and-enforces when interval <= 0
    import graft.pipeline.L1Pipeline
    import graft.core.{TableMeta, FileInfo, VariableMeta}
    val meta = TableMeta(FileInfo.dummy,
      Seq(VariableMeta("DATETIME", "TS", ""), VariableMeta("v", "arb", "")))
    val frame = good.withColumn("v", lit(1.0))
    val out = L1Pipeline.condition(
      L1Pipeline.Conditioned(frame, meta), "DATETIME", 0L,
      Map("v" -> "v"))
    assert(out.df.count() == 4)
  }
}
