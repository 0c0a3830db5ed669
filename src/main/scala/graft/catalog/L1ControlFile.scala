package graft.catalog

import scala.collection.immutable.ListMap

import graft.catalog.ConfigText.Section
import graft.pipeline.Xlsx

/** PFP L1 control-file parser (reference: `PFPL1CntlParser`,
  * `code/configs_editors/configs_editor.py:228-331` — the same class
  * is repeated at `variable_configurator.py:461-560`): pulls the
  * per-variable `Attr` + `xl` config pairs out of an L1 ConfigObj
  * control file into a flat attribute table (only variables carrying
  * an `xl` subsection participate; `sheet` renames to `table`; list
  * instruments join with commas; absent attrs become ""), exposes the
  * global attributes, and dumps both to a two-sheet workbook for
  * manual amendment.
  */
final class L1ControlFile(val config: Section) {

  def site: String = config.section("Global").scalar("site_name")

  /** Variables that carry an `xl` subsection — the parse list
    * (configs_editor.py:253-256). */
  def parseList: Seq[String] =
    config.section("Variables").sections.collect {
      case (name, s) if s.sections.contains("xl") => name
    }.toSeq

  /** The flat variable-attribute table: Attr fields then xl fields,
    * `sheet` renamed to `table`, missing fields as "", union of the
    * fields seen across variables (configs_editor.py:258-286). */
  def variableTable: Vector[(String, ListMap[String, String])] = {
    val vars = config.section("Variables")
    val rows = parseList.map { name =>
      val attr = vars.section(name).getSection("Attr")
        .map(flatten).getOrElse(ListMap.empty)
      val xl = vars.section(name).getSection("xl")
        .map(flatten).getOrElse(ListMap.empty)
      name -> (attr ++ xl).map {
        case ("sheet", v) => "table" -> v
        case kv => kv
      }
    }
    val fields = rows.flatMap(_._2.keys).distinct
    rows.toVector.map { case (name, attrs) =>
      name -> ListMap.from(fields.map(f => f -> attrs.getOrElse(f, "")))
    }
  }

  /** Global attributes with multi-valued entries joined
    * (configs_editor.py:290-305). */
  def globals: ListMap[String, String] =
    ListMap.from(config.section("Global").values.map {
      case (k, vs) => k -> vs.mkString("")
    })

  /** Two-sheet workbook: headerless `Global_attrs` key/value rows and
    * `Variable_attrs` with a `pfp_name` index column
    * (configs_editor.py:308-330). */
  def writeVariablesToExcel(path: String): Unit = {
    val table = variableTable
    val fields = table.headOption.map(_._2.keys.toSeq).getOrElse(Nil)
    val globalRows = globals.toSeq.map { case (k, v) =>
      Seq(Xlsx.Cell(k), Xlsx.Cell(v)) }
    val varRows =
      (Xlsx.Cell("pfp_name") +: fields.map(Xlsx.Cell(_))) +:
        table.map { case (name, attrs) =>
          Xlsx.Cell(name) +: fields.map(f => Xlsx.Cell(attrs(f)))
        }
    Xlsx.write(path, Seq(
      Xlsx.Sheet("Global_attrs", globalRows),
      Xlsx.Sheet("Variable_attrs", varRows)), Nil)
  }

  /** List -> comma-joined string, mirroring `_stringify_list`
    * (configs_editor.py:334-341). Handled structurally here: ConfigObj
    * list values arrive as Vectors and join on ",". */
  private def flatten(s: Section): ListMap[String, String] =
    ListMap.from(s.values.map { case (k, vs) => k -> vs.mkString(",") })
}

object L1ControlFile {
  def fromString(text: String): L1ControlFile =
    new L1ControlFile(ConfigText.parseConfigObj(text))

  def fromFile(path: String): L1ControlFile =
    fromString(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
}
