package graft.catalog

import scala.collection.immutable.ListMap

import org.apache.spark.sql.DataFrame

import graft.catalog.ConfigText.{YMap, YScalar, Yaml}

/** Variable-map authoring: spreadsheet/DataFrame -> per-site YAML
  * variable map with required-attribute validation and ignore-row
  * filtering (reference: `code/configs_editors/configs_editor.py:28-181`
  * — `var_attrs`/`optional_var_attrs`, the `ignore` filter, the
  * column subset, the non-null YAML dump, and the editor verbs).
  *
  * This is metadata tooling around the engine: a site's variable map is
  * tens of rows by contract, so the table lives on the driver. The
  * DataFrame entry point exists because upstream maps arrive as
  * spreadsheets read through the engine's sources; the collect is
  * bounded by the map's nature, and validation happens before collect
  * (missing required columns fail on the schema, not the data).
  */
final class ConfigsEditor private (
    private var table: Vector[(String, ListMap[String, String])],
    val listFields: Seq[String],
    val inputFile: Option[String]) {

  def listVariables: Seq[String] = table.map(_._1)

  def variableAttrs(variable: String): ListMap[String, String] =
    table.find(_._1 == variable).map(_._2)
      .getOrElse(throw new NoSuchElementException(
        s"variable '$variable' not in map"))

  def variableAttr(variable: String, field: String): String = {
    require(listFields.contains(field), s"unknown field '$field'")
    variableAttrs(variable)(field)
  }

  def setVariableAttr(variable: String, field: String, value: String): Unit = {
    require(listFields.contains(field), s"unknown field '$field'")
    val i = table.indexWhere(_._1 == variable)
    require(i >= 0, s"variable '$variable' not in map")
    table = table.updated(i, (variable, table(i)._2.updated(field, value)))
  }

  /** Add a variable; duplicate names refuse (configs_editor.py:103-134:
    * "Don't allow variable overwrites / duplicates"); non-standard keys
    * in `attrs` are ignored; absent standard keys become "". */
  def addVariable(name: String,
      attrs: Map[String, String] = Map.empty): Unit = {
    require(!table.exists(_._1 == name), s"Variable $name already in index!")
    val row = ListMap.from(listFields.map(f => f -> attrs.getOrElse(f, "")))
    table = table :+ (name -> row)
  }

  def removeVariable(name: String): Unit = {
    require(table.exists(_._1 == name), s"variable '$name' not in map")
    table = table.filterNot(_._1 == name)
  }

  def renameVariable(current: String, next: String): Unit =
    renameByMap(Map(current -> next))

  def renameByMap(m: Map[String, String]): Unit =
    table = table.map { case (n, a) => (m.getOrElse(n, n), a) }

  /** The YAML shape the reference dumps (configs_editor.py:156-176):
    * one map per variable with empty/null attrs removed; optionally
    * nested under {site: ..., variables: ...}. */
  def toYaml(nestWithSiteName: Option[String] = None): String = {
    val vars = YMap(table.map { case (n, attrs) =>
      n -> (YMap(attrs.toVector.collect {
        case (k, v) if v.nonEmpty => k -> (YScalar(v): Yaml)
      }): Yaml)
    })
    val root = nestWithSiteName match {
      case Some(site) => YMap(Vector(
        "site" -> YScalar(site), "variables" -> vars))
      case None => vars
    }
    ConfigText.writeYaml(root)
  }

  /** Write; refuses to overwrite the file this editor was loaded from
    * (configs_editor.py:158-163). */
  def writeYaml(path: String, nestWithSiteName: Option[String] = None): Unit = {
    require(!inputFile.map(java.nio.file.Paths.get(_).toAbsolutePath)
        .contains(java.nio.file.Paths.get(path).toAbsolutePath),
      "Cannot overwrite existing configuration file")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      toYaml(nestWithSiteName).getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Bridge into the engine's typed map + validation rules
    * ([[VariableMap.validate]]): one Entry per variable, attrs mapped
    * onto the Entry fields the validators read. */
  def toEntries: Seq[VariableMap.Entry] =
    table.map { case (pfpName, a) =>
      VariableMap.Entry(
        standardName = pfpName,
        siteName = a.getOrElse("name", ""),
        units = a.getOrElse("units", ""),
        logger = Some(a.getOrElse("logger", "")).filter(_.nonEmpty),
        table = Some(a.getOrElse("table", "")).filter(_.nonEmpty),
        height = a.get("height").flatMap(h =>
          h.stripSuffix("m").toDoubleOption),
        instrument = a.get("instrument").filter(_.nonEmpty),
        statisticType = a.get("statistic_type").filter(_.nonEmpty),
        longName = a.get("long_name").filter(_.nonEmpty))
    }
}

object ConfigsEditor {

  /** Required per-variable attributes (configs_editor.py:28-31). */
  val RequiredAttrs: Seq[String] =
    Seq("instrument", "statistic_type", "units", "height", "name",
      "logger", "table")

  /** Attributes kept only when present (configs_editor.py:32). */
  val OptionalAttrs: Seq[String] = Seq("long_name", "diag_type")

  /** Build from a DataFrame with a `pfp_name` column plus attribute
    * columns. Ignore-flagged rows are dropped BEFORE the required-attr
    * projection (configs_editor.py:52-63); every [[RequiredAttrs]]
    * column must exist or the build refuses, naming the missing attr;
    * optional columns ride along when present. */
  def fromDataFrame(df: DataFrame, inputFile: Option[String] = None,
      nameCol: String = "pfp_name"): ConfigsEditor = {
    val cols = df.columns.toSeq
    require(cols.contains(nameCol), s"missing index column '$nameCol'")
    val missing = RequiredAttrs.filterNot(cols.contains)
    require(missing.isEmpty,
      s"missing required variable attribute(s): ${missing.mkString(", ")}")
    val filtered =
      if (cols.contains("ignore"))
        df.filter(org.apache.spark.sql.functions.not(
          org.apache.spark.sql.functions.col("ignore").cast("boolean")))
      else df
    val useCols = RequiredAttrs ++ OptionalAttrs.filter(cols.contains)
    val rows = filtered
      .select((nameCol +: useCols).map(org.apache.spark.sql.functions.col): _*)
      .collect()
    val tbl = rows.toVector.map { r =>
      val name = Option(r.get(0)).map(_.toString).getOrElse("")
      name -> ListMap.from(useCols.zipWithIndex.map { case (c, i) =>
        c -> Option(r.get(i + 1)).map(_.toString).getOrElse("")
      })
    }
    new ConfigsEditor(tbl, useCols, inputFile)
  }

  /** Load back from the YAML this editor writes (either the flat
    * variable map or the site-nested form). Absent attrs were dropped
    * at write time as empties, so they rehydrate as "". */
  def fromYaml(text: String, inputFile: Option[String] = None): ConfigsEditor = {
    val tree = ConfigText.parseYamlTree(text)
    val vars = tree.get("variables") match {
      case Some(m: YMap) if tree.get("site").isDefined => m
      case _ => tree
    }
    val present = vars.entries.flatMap {
      case (_, m: YMap) => m.keys
      case _ => Vector.empty
    }.distinct
    val useCols = RequiredAttrs ++ OptionalAttrs.filter(present.contains)
    val tbl = vars.entries.map { case (name, node) =>
      val attrs = node match {
        case m: YMap => m.entries.collect {
          case (k, YScalar(v)) => k -> v
        }.toMap
        case _ => Map.empty[String, String]
      }
      name -> ListMap.from(useCols.map(c => c -> attrs.getOrElse(c, "")))
    }
    new ConfigsEditor(tbl, useCols, inputFile)
  }
}
