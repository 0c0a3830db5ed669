package graft.catalog

import scala.collection.immutable.ListMap

/** Template-driven L1 variable-config compilation (reference:
  * `code/configs_editors/variable_configurator.py:32-245`): a system
  * template (EasyFlux/TERNflux/EddyPro) is specialized with per-site
  * base configs (instrument heights), merged with the site's custom
  * variables under the replicate-numbering rules, and flux variables
  * get the system suffix melded into their names. Plus the standalone
  * name/height normalizers (`configs_editor.py:347-371`). Pure
  * driver-side metadata transformation — tens of rows by contract.
  */
object VariableConfigurator {

  /** Which template variable carries each configured height
    * (variable_configurator.py:32-38). */
  val ReferenceVars: Map[String, String] = Map(
    "turbflux" -> "Fco2", "radflux" -> "Fsd", "logger" -> "Tpanel",
    "TandRH" -> "Ta", "rain" -> "Precip")

  /** System type -> flux-name suffix (variable_configurator.py:40-44). */
  val SystemSuffixes: Map[String, String] = Map(
    "EasyFlux" -> "EF", "TERNflux" -> "DL", "EddyPro" -> "EP")

  /** Variables whose names take the system suffix
    * (variable_configurator.py:46). */
  val SuffixVars: Seq[String] = Seq("Fco2", "Fe", "Fh", "Fm")

  /** Replicated generic variables that get height-suffixed names and
    * replicate numbering (variable_configurator.py:152-158,166). */
  val GenericVars: Seq[String] = Seq("Ta", "RH", "AH")

  /** Meld a flux-system suffix into a variable name:
    * `Fco2` -> `Fco2_EP`, `Fco2_QC` -> `Fco2_EP_QC`; more than two
    * `_`-elements refuses (variable_configurator.py:240-249). */
  def meldNames(name: String, suffix: String): String = {
    val elems = name.split("_").toSeq
    val out = s"${elems.head}_$suffix"
    elems.length match {
      case 1 => out
      case 2 => s"${out}_${elems.last}"
      case _ => throw new IllegalArgumentException(
        s"Too many elements in name ($name)!")
    }
  }

  /** Soil-style depth token conversion: `Sws_10cma_Avg` ->
    * `Sws_0.1ma_Avg` (configs_editor.py:347-360 `convert_cm_to_m` —
    * quantity slot, location slot with a `cm` marker, rest carried).
    * Whole metres render as `1m`, not the reference's `1.m`
    * rstrip-fencepost. */
  def convertCmToM(varName: String): String = {
    require(varName.contains("cm"),
      "Only pass variables with a depth identifier in cm!")
    val elems = varName.split("_").toSeq
    val (quant, loc, other) = (elems.head, elems(1), elems.drop(2))
    require(loc.contains("cm"),
      "Variable must have location identifiers in second slot!")
    val Array(depth, rest @ _*) = loc.split("cm", -1): @unchecked
    val m = (depth.trim.toInt / 100.0).toString
      .reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
    ((quant +: (m + "m" + rest.mkString) +: other)).mkString("_")
  }

  /** Height-attribute normalizer: collapse spaces, ensure an `m` unit
    * on the lower bound of a range (configs_editor.py:362-371):
    * `" 2 "` -> `"2"`, `"0.5 to 1"` -> `"0.5m to 1"`. */
  def convertHeightAttr(oldAttr: String): String = {
    val elems = oldAttr.split("to").map(_.replace(" ", ""))
    if (elems.length == 1) elems.head
    else {
      val lo = if (elems.head.contains("m")) elems.head else elems.head + "m"
      lo + " to " + elems(1)
    }
  }

  /** Specialize a template against site base configs
    * (variable_configurator.py:131-161 `_build_template_df`;
    * ignore-row filtering happens at load in
    * [[ConfigsEditor.fromDataFrame]]): for each reference-height key (plus
    * `press`->`ps` when `press_height` is configured) the height lands
    * on every row sharing the reference variable's instrument(s); then
    * Ta/RH/AH get their height suffixed into the name. */
  def specializeTemplate(template: ConfigsEditor,
      systemConfigs: Map[String, String]): ConfigsEditor = {
    val refs = ReferenceVars ++
      (if (systemConfigs.contains("press_height")) Map("press" -> "ps")
       else Map.empty)
    refs.foreach { case (key, refVar) =>
      val instruments = template.variableAttr(refVar, "instrument")
        .split(",").map(_.trim).filter(_.nonEmpty)
      val height = systemConfigs(s"${key}_height")
      template.listVariables.foreach { v =>
        if (instruments.contains(template.variableAttr(v, "instrument")))
          template.setVariableAttr(v, "height", height)
      }
    }
    val renames = GenericVars.flatMap { v =>
      if (template.listVariables.contains(v))
        Some(v -> s"${v}_${template.variableAttr(v, "height")}")
      else None
    }.toMap
    template.renameByMap(renames)
    template
  }

  /** Merge template and custom variable maps
    * (variable_configurator.py:164-193 `_merge_dfs`): a custom entry
    * may not collide with a template name outright; custom replicates
    * of a generic variable must be numbered 2..n contiguously, which
    * renames the template's copy to replicate 1; custom rows append
    * after template rows. */
  def mergeWithCustom(template: ConfigsEditor,
      custom: ConfigsEditor): ConfigsEditor = {
    val templateVars = template.listVariables
    val customVars = custom.listVariables
    val renames = GenericVars.flatMap { generic =>
      templateVars.filter(v =>
          v.contains(generic) && !v.contains("IRGA")).flatMap { v =>
        if (customVars.contains(v))
          throw new IllegalArgumentException(
            "Variable already in template! If it is a replicate, add a " +
            "replicate number for clarity!")
        val reps = customVars.filter(_.contains(v)).sorted
        if (reps.isEmpty) None
        else {
          val nums = reps.map(_.split(v.quoted).last.toInt)
          val want = (2 until 2 + nums.length).toList
          if (nums.toList != want)
            throw new IllegalArgumentException(
              s"Replicates for variable $v must begin at replicate `2` " +
              "and increase in steps of exactly 1!")
          Some(v -> s"${v}1")
        }
      }
    }.toMap
    template.renameByMap(renames)
    customVars.foreach(v => template.addVariable(v, custom.variableAttrs(v)))
    template
  }

  private implicit class QuotedName(private val s: String) extends AnyVal {
    def quoted: String = java.util.regex.Pattern.quote(s)
  }

  /** Full compilation (variable_configurator.py:103-119
    * `compile_configs`): specialize the template, merge the custom
    * variables, then meld the flux-system suffix into every variable
    * starting with a [[SuffixVars]] stem. */
  def compile(template: ConfigsEditor, custom: ConfigsEditor,
      systemConfigs: Map[String, String]): ConfigsEditor = {
    val systemType = systemConfigs("system_type")
    val fluxSuffix = SystemSuffixes(systemType.split("_").head)
    val merged = mergeWithCustom(
      specializeTemplate(template, systemConfigs), custom)
    val fluxRenames = merged.listVariables.flatMap { v =>
      if (SuffixVars.exists(v.startsWith))
        Some(v -> meldNames(v, fluxSuffix)) else None
    }.toMap
    merged.renameByMap(fluxRenames)
    merged
  }
}
