package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.{FileInfo, TableMeta, VariableMeta}
import graft.functions.Conversions
import graft.pipeline.{L1Pipeline, MergeLegality}
import graft.pipeline.L1Pipeline.Conditioned

class L1PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def meta(vars: (String, String)*): TableMeta =
    TableMeta(FileInfo.dummy,
      vars.map { case (n, u) => VariableMeta(n, u, "Avg") })

  test("condition: rename + dedup + regularize (DataHandler chain)") {
    val df = Seq(
      (ts("2024-01-01 00:30:00"), 1.0, 9.9),
      (ts("2024-01-01 00:30:00"), 1.0, 9.9),     // exact dup
      (ts("2024-01-01 01:30:00"), 3.0, 9.9)      // 01:00 missing
    ).toDF("DATETIME", "Ta_site", "junk")
    val out = L1Pipeline.condition(
      Conditioned(df, meta(("Ta_site", "degC"), ("junk", ""))),
      "DATETIME", 1800, Map("Ta_site" -> "Ta"))
    assert(out.df.columns.toSeq == Seq("DATETIME", "Ta"))
    assert(out.df.count() == 3) // grid restored the missing tick
    assert(out.meta.variableNames == Seq("Ta"))
  }

  test("mergeOnTime full-outer aligns sources (J3)") {
    val a = Conditioned(Seq((ts("2024-01-01 00:30:00"), 1.0))
      .toDF("DATETIME", "Ta"), meta(("Ta", "degC")))
    val b = Conditioned(Seq((ts("2024-01-01 01:00:00"), 55.0))
      .toDF("DATETIME", "RH"), meta(("RH", "percent")))
    val m = L1Pipeline.mergeOnTime(Seq(a, b), "DATETIME")
    assert(m.df.count() == 2)
    assert(m.df.columns.toSet == Set("DATETIME", "Ta", "RH"))
    assert(m.meta.variableNames.sorted == Seq("RH", "Ta"))
  }

  test("convertUnits updates frame and catalog in lockstep (F12/#9)") {
    val c = Conditioned(
      Seq((ts("2024-01-01 00:30:00"), 101300.0)).toDF("DATETIME", "ps"),
      meta(("ps", "Pa")))
    val out = L1Pipeline.convertUnits(c,
      Map("ps" -> ((Conversions.paToKpa _, "kPa"))))
    assert(out.df.head().getDouble(1) == 101.3)
    assert(out.meta.variables.head.units == "kPa")
  }

  test("lake write partitions by end-labelled year and round-trips (K4/K5/J4)") {
    val c = Conditioned(Seq(
      (ts("2024-01-01 00:00:00"), 1.0),  // end-label -> belongs to 2023
      (ts("2024-06-01 00:00:00"), 2.0),
      (ts("2025-01-01 00:00:00"), Double.NaN)
    ).toDF("DATETIME", "Ta")
      .withColumn("Ta", when(isnan(col("Ta")), lit(null)).otherwise(col("Ta"))),
      meta(("Ta", "degC")))
    val dir = Files.createTempDirectory("lake").toString
    L1Pipeline.writeLake(c, "DATETIME", 1800, dir, "TestSite")

    val years = spark.read.parquet(s"$dir/data")
      .select("year").distinct().as[Int].collect().sorted
    assert(years.toSeq == Seq(2023, 2024))
    val flags = spark.read.parquet(s"$dir/data")
      .filter(col("Ta").isNull).select("Ta_QCFlag").as[Int].collect()
    assert(flags.toSeq == Seq(1))
    val back = L1Pipeline.readLake(spark, dir, Seq(2024))
    assert(back.count() == 2)
    assert(!back.columns.exists(_.endsWith("_QCFlag")))
    assert(Files.readString(java.nio.file.Path.of(s"$dir/attrs.json"))
      .contains("TestSite"))
  }

  test("merge legality: unit aliases ok, conflicts flagged (J2)") {
    val master = Conditioned(
      Seq((ts("2024-01-01 00:30:00"), 1.0), (ts("2024-01-01 01:00:00"), 2.0))
        .toDF("DATETIME", "Ta"), meta(("Ta", "degC")))
    val cand = Conditioned(
      Seq((ts("2024-01-01 01:30:00"), 3.0), (ts("2024-01-01 02:00:00"), 4.0))
        .toDF("DATETIME", "Ta"), meta(("Ta", "C")))
    val r = MergeLegality.analyse(master.df, master.meta, cand.df, cand.meta,
      "DATETIME")
    assert(r.legal && r.contributesNewDates && r.sameInterval)
    assert(r.unitConflicts.isEmpty) // degC ~ C alias

    val bad = cand.copy(meta = meta(("Ta", "K")))
    val r2 = MergeLegality.analyse(master.df, master.meta, bad.df, bad.meta,
      "DATETIME")
    assert(!r2.legal && r2.unitConflicts == Seq(("Ta", "degC", "K")))
  }
}
