package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TableMeta
import graft.operators.{JoinOps, TimeSeriesOps}

/** L1 product construction — the reference's flagship pipeline (E1,
  * SURVEY.md §3): per-file scan+condition, horizontal merge on the
  * time axis, unit conversions, QC flags, year-partitioned lake write.
  *
  * The (DataFrame, TableMeta) pair is one immutable value transformed
  * together (SURVEY §7.4 #9): every rename/derive updates both.
  */
object L1Pipeline {

  final case class Conditioned(df: DataFrame, meta: TableMeta)

  /** Condition one source frame (reference DataHandler
    * get_conditioned_data, file_handler.py:21-125): subset+rename
    * (P1), exact dedup (D1), drop dup-timestamp rows (D2, keep-first
    * policy), regularize to the site interval (A1). An `intervalSec`
    * <= 0 means "infer": the interval is taken from the data via
    * [[TimeSeriesOps.requireUniformInterval]], which enforces the
    * reference's min==mode policy (file_io.py:1079-1087) and throws
    * when sub-interval rows survive the dedup. */
  def condition(c: Conditioned, tsCol: String, intervalSec: Long,
      usecols: Map[String, String]): Conditioned = {
    val selected = c.df.select(
      col(tsCol) +: usecols.toSeq.sortBy(_._1).map {
        case (from, to) => col(from).as(to) }: _*)
    val deduped = selected.dropDuplicates()
      .dropDuplicates(tsCol)    // D2 keep-one policy
    val step =
      if (intervalSec > 0) intervalSec
      else TimeSeriesOps.requireUniformInterval(deduped, tsCol)
    val regular = TimeSeriesOps.regularize(deduped, tsCol, step)
    Conditioned(regular,
      c.meta.subset(usecols.keys.toSeq).withRenames(usecols))
  }

  /** J3 horizontal merge: fold of full-outer joins on the timestamp.
    * All sides shuffle once on ts; Catalyst reuses the exchange. */
  def mergeOnTime(frames: Seq[Conditioned], tsCol: String): Conditioned = {
    val df = JoinOps.mergeOnTime(frames.map(_.df), Seq(tsCol))
    val meta = frames.head.meta.copy(
      variables = frames.flatMap(_.meta.variables)
        .groupBy(_.name).map(_._2.head).toSeq.sortBy(_.name))
    Conditioned(df, meta)
  }

  /** Apply unit conversions by name-keyed dispatch (F12): each entry
    * maps a column to a converted expression + new units string. */
  def convertUnits(c: Conditioned,
      conversions: Map[String, (Column => Column, String)]): Conditioned = {
    val df = conversions.foldLeft(c.df) { case (d, (name, (f, _))) =>
      if (d.columns.contains(name)) d.withColumn(name, f(col(name))) else d
    }
    val meta = c.meta.copy(variables = c.meta.variables.map { v =>
      conversions.get(v.name).fold(v) { case (_, u) => v.copy(units = u) }
    })
    Conditioned(df, meta)
  }

  /** P5 range-mask every variable with plausible bounds in the catalog
    * (masking, never filtering — grid density is preserved). */
  def maskPlausible(c: Conditioned): Conditioned = {
    val df = c.meta.variables.foldLeft(c.df) { (d, v) =>
      (v.plausibleMin, v.plausibleMax) match {
        case (Some(lo), Some(hi)) if d.columns.contains(v.name) =>
          d.withColumn(v.name, TimeSeriesOps.maskRange(col(v.name), lo, hi))
        case _ => d
      }
    }
    c.copy(df = df)
  }

  /** K5 QC flags: for every data variable add `<var>_QCFlag` =
    * 1 where null else 0 (reference: nc_constructors.py:701-719). */
  def withQcFlags(df: DataFrame, tsCol: String): DataFrame =
    df.columns.filter(_ != tsCol).foldLeft(df) { (d, c) =>
      d.withColumn(s"${c}_QCFlag",
        when(col(c).isNull, 1).otherwise(0).cast("int"))
    }

  /** End-of-interval year labeling (SURVEY §7.4 #4): a timestamp
    * labeling the END of its averaging interval belongs to the year of
    * `ts - interval` + 1-tick convention: year boundaries are
    * (Jan-1 + step, next Jan-1] (reference: nc_constructors.py:498-517).
    */
  def labelYear(ts: Column, intervalSec: Long): Column =
    year(timestamp_micros(unix_micros(ts) - intervalSec * 1000000L))

  /** K4: year-partitioned parquet lake write + JSON attrs sidecar with
    * the same information content as the netCDF global attributes
    * (title/time coverage/interval). Partition column `year` enables
    * partition pruning for the yearly readers (J4 becomes a plain
    * partitioned read). */
  def writeLake(c: Conditioned, tsCol: String, intervalSec: Long,
      outDir: String, site: String): Unit = {
    val withYear = withQcFlags(c.df, tsCol)
      .withColumn("year", labelYear(col(tsCol), intervalSec))
    withYear.write.mode("overwrite").partitionBy("year")
      .parquet(s"$outDir/data")

    val span = c.df.agg(min(col(tsCol)).cast("string"),
      max(col(tsCol)).cast("string")).head()
    val attrs = Map(
      "site" -> site,
      "time_coverage_start" -> span.getString(0),
      "time_coverage_end" -> span.getString(1),
      "interval_seconds" -> intervalSec.toString,
      "variables" -> c.meta.variables.map(v =>
        s"${v.name}:${v.units}:${v.sampling}").mkString(";"))
    val json = attrs.map { case (k, v) =>
      "\"" + k + "\": \"" + v.replace("\"", "\\\"") + "\""
    }.mkString("{", ", ", "}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/attrs.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** J4 multi-year read-back: partitioned parquet scan (year pruning
    * is free); QC flag columns dropped for analysis reads. */
  def readLake(spark: SparkSession, outDir: String,
      years: Seq[Int] = Nil): DataFrame = {
    val df = spark.read.parquet(s"$outDir/data")
    val pruned = if (years.nonEmpty) df.filter(col("year").isin(years: _*))
      else df
    pruned.drop(pruned.columns.filter(_.endsWith("_QCFlag")).toIndexedSeq: _*)
  }
}
