package graft.core

/** Core data-model types for the time-series engine.
  *
  * Mirrors the reference's out-of-band metadata (SURVEY.md §1.1):
  * a regular-interval single-site table = data rows + a headers table
  * (variable -> units/sampling) + an 8-field file info record. The
  * (DataFrame, catalog) pair travels together through the pipeline so
  * renames/derivations update both in lockstep (SURVEY §7.4 #9).
  */

/** File-level info record — the 8 fields of a TOA5 info line
  * (reference: code/file_handling/file_io.py:41-44,224-262). */
final case class FileInfo(
    format: String,
    stationName: String,
    loggerType: String,
    serialNum: String,
    osVersion: String,
    programName: String,
    programSig: String,
    tableName: String)

object FileInfo {
  /** Dummy info for formats lacking an info line (EddyPro). */
  val dummy: FileInfo = FileInfo(
    "TOA5", "NoStation", "NoLogger", "9999", "NoOS", "NoProgram",
    "9999", "NoTable")
}

/** Per-variable out-of-band metadata: units + statistic type
  * (Avg/Tot/Smp/Sd/Vr/Ct), plus optional standard-vocabulary attrs.
  * (reference: code/file_handling/file_io.py:186-221). */
final case class VariableMeta(
    name: String,
    units: String,
    sampling: String,
    longName: Option[String] = None,
    standardName: Option[String] = None,
    plausibleMin: Option[Double] = None,
    plausibleMax: Option[Double] = None)

/** Table-level metadata: file info + ordered variable catalog +
  * nominal measurement interval (minutes). */
final case class TableMeta(
    info: FileInfo,
    variables: Seq[VariableMeta],
    intervalMinutes: Option[Int] = None) {

  def variableNames: Seq[String] = variables.map(_.name)

  def withRenames(renames: Map[String, String]): TableMeta =
    copy(variables = variables.map(v =>
      renames.get(v.name).fold(v)(n => v.copy(name = n))))

  def subset(keep: Seq[String]): TableMeta = {
    val byName = variables.map(v => v.name -> v).toMap
    copy(variables = keep.flatMap(byName.get))
  }
}

/** Format descriptors mirroring the reference's raw_file_format.yml
  * (code/configs/raw_file_format.yml:1-49): which physical lines hold
  * names/units/sampling, separator, NA token, format-sniff magic. */
final case class FileFormat(
    name: String,
    separator: String,
    naToken: String,
    headerLines: Int,
    namesLine: Int,
    unitsLine: Option[Int],
    samplingLine: Option[Int],
    infoLine: Option[Int],
    uniqueFileId: String,
    nonNumericCols: Seq[String],
    quoteNonNumeric: Boolean)

object FileFormat {
  val Toa5: FileFormat = FileFormat(
    name = "TOA5", separator = ",", naToken = "NAN", headerLines = 4,
    namesLine = 1, unitsLine = Some(2), samplingLine = Some(3),
    infoLine = Some(0), uniqueFileId = "TOA5",
    nonNumericCols = Seq("TIMESTAMP"), quoteNonNumeric = true)

  val EddyPro: FileFormat = FileFormat(
    name = "EddyPro", separator = "\t", naToken = "NaN", headerLines = 2,
    namesLine = 0, unitsLine = Some(1), samplingLine = None,
    infoLine = None, uniqueFileId = "DATAH",
    nonNumericCols = Seq("DATAH", "filename", "date", "time"),
    quoteNonNumeric = false)

  val all: Seq[FileFormat] = Seq(Toa5, EddyPro)

  /** S3 format sniff: match first field of line 0 against each
    * format's magic (reference: file_io.py:265-292). */
  def detect(firstLine: String): Option[FileFormat] = {
    val first = firstLine.split("[,\t]")(0).replaceAll("^\"|\"$", "")
    all.find(_.uniqueFileId == first)
  }
}
