package graft.catalog

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import graft.catalog.ConfigText.Section

/** Editor for PFP L2 control files (reference:
  * `code/configs_editors/pfp_configs_editor.py:40-248` and the JSON
  * correction applier `edit_configs.py:44-120`): refuses non-L2 files,
  * exposes per-variable configs restricted to the allowed kinds, sets
  * numeric range checks, and folds new date exclusions into the
  * existing set with overlap merging and renumbering. Driver-side
  * tooling over the ConfigObj dialect in [[ConfigText]].
  */
final class L2ConfigsEditor(val config: Section,
    val inputFile: Option[String]) {
  import L2ConfigsEditor._

  require(config.values.get("level").map(_.mkString("")).contains("L2"),
    "Control file level must be L2!")

  private def variables: Section = config.section("Variables")

  def variableList: Seq[String] = variables.sections.keys.toSeq

  def variableConfigs(variable: String): Section =
    variables.section(variable)

  def variableConfigs(variable: String, configField: String): Section = {
    require(AllowedConfigs.contains(configField),
      s"config_field must be one of ${AllowedConfigs.mkString(", ")}")
    variables.section(variable).section(configField)
  }

  /** Set the RangeCheck bounds; both must parse as numbers
    * (pfp_configs_editor.py:104-133). */
  def setVariableRange(variable: String, lower: String,
      upper: String): Unit = {
    Seq(lower, upper).foreach(v => require(v.toDoubleOption.isDefined,
      s"range bound '$v' is not numeric"))
    val rc = variables.section(variable).subsection("RangeCheck")
    rc.values.clear()
    rc.values("lower") = Vector(lower)
    rc.values("upper") = Vector(upper)
  }

  /** Fold one [first, last] exclusion (inclusive, `yyyy-MM-dd HH:mm`)
    * into the variable's ExcludeDates: parse the existing ranges,
    * append, sort by start, merge overlaps (touching ranges merge;
    * adjacent-but-later starts stay separate), renumber from 0
    * (pfp_configs_editor.py:135-189). A missing ExcludeDates section
    * starts empty rather than refusing. */
  def setDateExclusions(variable: String, firstDate: String,
      lastDate: String): Unit = {
    val v = variables.section(variable)
    val ex = v.subsection("ExcludeDates")
    val ranges = ex.values.values.toList.map {
      case Vector(a, b) => (parseDate(a), parseDate(b))
      case other => throw new IllegalArgumentException(
        s"ExcludeDates entry is not a date pair: $other")
    } :+ ((parseDate(firstDate), parseDate(lastDate)))
    val merged = combineDates(ranges)
    ex.values.clear()
    merged.zipWithIndex.foreach { case ((a, b), i) =>
      ex.values(i.toString) = Vector(a.format(Fmt), b.format(Fmt))
    }
  }

  /** Write; refuses to overwrite the input file
    * (pfp_configs_editor.py:191-213). */
  def write(path: String): Unit = {
    require(!inputFile.map(java.nio.file.Paths.get(_).toAbsolutePath)
        .contains(java.nio.file.Paths.get(path).toAbsolutePath),
      "Cannot overwrite existing configuration file!")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      ConfigText.writeConfigObj(config)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}

object L2ConfigsEditor {

  /** The only per-variable config kinds the editor serves
    * (pfp_configs_editor.py:26). */
  val AllowedConfigs: Seq[String] = Seq("RangeCheck", "ExcludeDates")

  val Fmt: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm")

  def parseDate(s: String): LocalDateTime = LocalDateTime.parse(s.trim, Fmt)

  /** Sort by start and merge overlapping/touching ranges
    * (pfp_configs_editor.py:218-243 `_combine_dates`: a range starting
    * strictly after the running end opens a new interval; otherwise it
    * extends the running end to the max). */
  def combineDates(ranges: List[(LocalDateTime, LocalDateTime)])
      : List[(LocalDateTime, LocalDateTime)] =
    ranges.sortBy(_._1).foldLeft(List.empty[(LocalDateTime, LocalDateTime)]) {
      case (acc, (s, e)) => acc match {
        case (ps, pe) :: tail if !s.isAfter(pe) =>
          (ps, if (e.isAfter(pe)) e else pe) :: tail
        case _ => (s, e) :: acc
      }
    }.reverse

  def fromString(text: String, inputFile: Option[String] = None)
      : L2ConfigsEditor =
    new L2ConfigsEditor(ConfigText.parseConfigObj(text), inputFile)

  def fromFile(path: String): L2ConfigsEditor =
    fromString(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8),
      Some(path))

  /** Apply a JSON-shaped correction set (edit_configs.py:44-120): the
    * corrections map one variable to its RangeCheck pair and/or
    * ExcludeDates date-pair list; the site name must match. */
  def applyCorrections(editor: L2ConfigsEditor, site: String,
      jsonSite: String,
      corrections: Map[String, VariableCorrections]): Unit = {
    require(jsonSite == site,
      s"Passed site name ($site) does not match json file site name $jsonSite")
    require(corrections.nonEmpty, "No variables provided in json input file!")
    corrections.foreach { case (variable, c) =>
      c.excludeDates.foreach { case (first, last) =>
        editor.setDateExclusions(variable, first, last)
      }
      c.rangeCheck.foreach { case (lo, hi) =>
        editor.setVariableRange(variable, lo, hi)
      }
    }
  }

  final case class VariableCorrections(
      rangeCheck: Option[(String, String)] = None,
      excludeDates: Seq[(String, String)] = Nil)
}
