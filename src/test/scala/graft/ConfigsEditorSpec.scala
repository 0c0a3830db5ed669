package graft

import org.apache.spark.sql.functions._

import graft.catalog.{ConfigsEditor, ConfigText, L1ControlFile,
  L2ConfigsEditor, VariableConfigurator, VariableMap}

/** configs_editors port: variable-map authoring (DataFrame -> YAML
  * round-trip, required-attr refusal, editor verbs), template
  * compilation, the L1 control-file parser, and the L2 editor. */
class ConfigsEditorSpec extends SparkSpec {
  import spark.implicits._

  private def mapDf = Seq(
    // pfp_name, instrument, statistic_type, units, height, name, logger, table, long_name, ignore
    ("Ta_HMP_2m", "HMP155", "average", "degC", "2m", "AirTC_Avg",
      "CR1000", "Met30Min", "", false),
    ("RH_HMP_2m", "HMP155", "average", "%", "2m", "RH_Avg",
      "CR1000", "Met30Min", "", false),
    ("Junk", "X", "average", "arb", "1m", "Junk_Avg",
      "CR1000", "Met30Min", "", true),
    ("Custom_Var_1", "HMP155", "average", "arb", "2m", "Custom_Avg",
      "CR1000", "Met30Min", "custom diagnostic", false)
  ).toDF("pfp_name", "instrument", "statistic_type", "units", "height",
    "name", "logger", "table", "long_name", "ignore")

  test("fromDataFrame filters ignore rows, keeps optionals, round-trips YAML") {
    val ed = ConfigsEditor.fromDataFrame(mapDf)
    assert(ed.listVariables == Seq("Ta_HMP_2m", "RH_HMP_2m", "Custom_Var_1"))
    assert(ed.listFields.contains("long_name")) // optional kept (present)
    assert(!ed.listFields.contains("diag_type")) // optional absent
    assert(ed.variableAttr("Ta_HMP_2m", "units") == "degC")

    val yaml = ed.toYaml()
    // empty attrs are dropped in the dump (non-null only)
    assert(!yaml.contains("long_name: ''"))
    val back = ConfigsEditor.fromYaml(yaml)
    assert(back.listVariables == ed.listVariables)
    assert(back.listFields == ed.listFields)
    ed.listVariables.foreach { v =>
      assert(back.variableAttrs(v) == ed.variableAttrs(v), s"attrs of $v")
    }
    // nested form round-trips too
    val nested = ConfigsEditor.fromYaml(ed.toYaml(Some("Calperum")))
    assert(nested.listVariables == ed.listVariables)
  }

  test("fromDataFrame rejects each missing required attr by name") {
    ConfigsEditor.RequiredAttrs.foreach { attr =>
      val e = intercept[IllegalArgumentException] {
        ConfigsEditor.fromDataFrame(mapDf.drop(attr))
      }
      assert(e.getMessage.contains(attr), s"error must name '$attr'")
    }
    val e = intercept[IllegalArgumentException] {
      ConfigsEditor.fromDataFrame(mapDf.drop("pfp_name"))
    }
    assert(e.getMessage.contains("pfp_name"))
  }

  test("editor verbs: add (no dup), set, rename, remove, no self-overwrite") {
    val ed = ConfigsEditor.fromDataFrame(mapDf,
      inputFile = Some("/tmp/graft_cfg_in.yml"))
    intercept[IllegalArgumentException] {
      ed.addVariable("Ta_HMP_2m")
    }
    ed.addVariable("Fco2", Map("units" -> "umol/m^2/s", "bogus" -> "zzz"))
    assert(ed.variableAttr("Fco2", "units") == "umol/m^2/s")
    assert(ed.variableAttr("Fco2", "logger") == "") // missing -> ""
    assert(!ed.variableAttrs("Fco2").contains("bogus")) // non-standard dropped
    ed.setVariableAttr("Fco2", "logger", "CR6")
    assert(ed.variableAttr("Fco2", "logger") == "CR6")
    ed.renameVariable("Fco2", "Fco2_EP")
    assert(ed.listVariables.contains("Fco2_EP"))
    ed.removeVariable("Fco2_EP")
    assert(!ed.listVariables.contains("Fco2_EP"))
    intercept[IllegalArgumentException] {
      ed.writeYaml("/tmp/graft_cfg_in.yml")
    }
  }

  test("toEntries bridges into VariableMap.validate") {
    val ed = ConfigsEditor.fromDataFrame(mapDf)
    val entries = ed.toEntries
    assert(entries.map(_.standardName) ==
      Seq("Ta_HMP_2m", "RH_HMP_2m", "Custom_Var_1"))
    assert(entries.head.height.contains(2.0))
    assert(entries.head.logger.contains("CR1000"))
    // MyCustom fails the PFP grammar but carries long_name (escape
    // hatch); the two standard names parse -> no violations at all
    assert(VariableMap.validate(entries).isEmpty)
    // dropping the long_name makes the custom name a BadName violation
    val broken = entries.map(e =>
      if (e.standardName == "Custom_Var_1") e.copy(longName = None) else e)
    assert(VariableMap.validate(broken).exists {
      case VariableMap.BadName("Custom_Var_1", _) => true; case _ => false
    })
  }

  test("template compilation: heights, generic renames, replicates, flux suffix") {
    def editorOf(rows: Seq[(String, String, String, String)]) = {
      val df = rows.toDF("pfp_name", "instrument", "height", "units")
        .withColumn("statistic_type", lit("average"))
        .withColumn("name", col("pfp_name"))
        .withColumn("logger", lit("CR6")).withColumn("table", lit("Flux30"))
      ConfigsEditor.fromDataFrame(df)
    }
    val template = editorOf(Seq(
      ("Fco2", "IRGASON", "", "umol/m^2/s"),
      ("Fsd", "CNR4", "", "W/m^2"),
      ("Tpanel", "CR6", "", "degC"),
      ("Ta", "HMP155", "", "degC"),
      ("RH", "HMP155", "", "%"),
      ("Precip", "TB4", "", "mm")))
    val custom = editorOf(Seq(("Ta_2m2", "HMP60", "2m", "degC")))
    val compiled = VariableConfigurator.compile(template, custom, Map(
      "system_type" -> "EasyFlux_CR6",
      "turbflux_height" -> "20m", "radflux_height" -> "10m",
      "logger_height" -> "1m", "TandRH_height" -> "2m",
      "rain_height" -> "1m"))
    val vars = compiled.listVariables
    // flux suffix melded from EasyFlux -> EF
    assert(vars.contains("Fco2_EF") && !vars.contains("Fco2"))
    // Ta renamed with height, then replicate-1 suffix (custom has _2m2)
    assert(vars.contains("Ta_2m1") && vars.contains("Ta_2m2"))
    // RH gets height but no replicate suffix (no custom RH replicate)
    assert(vars.contains("RH_2m"))
    // heights landed by instrument: both HMP155 rows got TandRH height
    assert(compiled.variableAttr("RH_2m", "height") == "2m")
    assert(compiled.variableAttr("Fco2_EF", "height") == "20m")
    assert(compiled.variableAttr("Fsd", "height") == "10m")

    // an outright custom/template name collision refuses
    val t2 = editorOf(Seq(("Ta_2m", "HMP155", "2m", "degC")))
    val c2 = editorOf(Seq(("Ta_2m", "HMP60", "2m", "degC")))
    val collide = intercept[IllegalArgumentException] {
      VariableConfigurator.mergeWithCustom(t2, c2)
    }
    assert(collide.getMessage.contains("already in template"))
    // replicates must start at 2 and be contiguous
    val t3 = editorOf(Seq(("Ta_2m", "HMP155", "2m", "degC")))
    val c3 = editorOf(Seq(("Ta_2m3", "HMP60", "2m", "degC")))
    val e = intercept[IllegalArgumentException] {
      VariableConfigurator.mergeWithCustom(t3, c3)
    }
    assert(e.getMessage.contains("replicate"))
  }

  test("name/height normalizers: meldNames, convertCmToM, convertHeightAttr") {
    assert(VariableConfigurator.meldNames("Fco2", "EP") == "Fco2_EP")
    assert(VariableConfigurator.meldNames("Fco2_QC", "EP") == "Fco2_EP_QC")
    intercept[IllegalArgumentException] {
      VariableConfigurator.meldNames("F_a_b", "EP")
    }
    assert(VariableConfigurator.convertCmToM("Sws_10cma_Avg") == "Sws_0.1ma_Avg")
    assert(VariableConfigurator.convertCmToM("Ts_50cm_Avg") == "Ts_0.5m_Avg")
    assert(VariableConfigurator.convertCmToM("Ts_100cm_Avg") == "Ts_1m_Avg")
    intercept[IllegalArgumentException] {
      VariableConfigurator.convertCmToM("Ta_2m_Avg")
    }
    assert(VariableConfigurator.convertHeightAttr(" 2 ") == "2")
    assert(VariableConfigurator.convertHeightAttr("0.5 to 1") == "0.5m to 1")
    assert(VariableConfigurator.convertHeightAttr("2m to 4m") == "2m to 4m")
  }

  private val l2Text =
    """level = L2
      |[Variables]
      |    [[Fco2]]
      |        [[[RangeCheck]]]
      |            lower = -20
      |            upper = 20
      |        [[[ExcludeDates]]]
      |            0 = 2020-01-01 00:00, 2020-02-01 00:00
      |    [[Fh]]
      |        [[[RangeCheck]]]
      |            lower = -100
      |            upper = 600
      |""".stripMargin

  test("L2 editor: level guard, range set, date-exclusion merge, write guard") {
    intercept[IllegalArgumentException] {
      L2ConfigsEditor.fromString("level = L1\n[Variables]\n")
    }
    val ed = L2ConfigsEditor.fromString(l2Text)
    assert(ed.variableList == Seq("Fco2", "Fh"))
    assert(ed.variableConfigs("Fco2", "RangeCheck").scalar("lower") == "-20")
    intercept[IllegalArgumentException] {
      ed.variableConfigs("Fco2", "Bogus")
    }
    intercept[IllegalArgumentException] {
      ed.setVariableRange("Fh", "low", "600")
    }
    ed.setVariableRange("Fh", "-150", "650")
    assert(ed.variableConfigs("Fh", "RangeCheck").scalar("lower") == "-150")

    // overlapping exclusion merges with the existing range...
    ed.setDateExclusions("Fco2", "2020-01-15 00:00", "2020-03-01 00:00")
    // ...and a disjoint one appends, renumbered in order
    ed.setDateExclusions("Fco2", "2021-01-01 00:00", "2021-01-02 00:00")
    val ex = ed.variableConfigs("Fco2", "ExcludeDates")
    assert(ex.values.keys.toSeq == Seq("0", "1"))
    assert(ex.values("0") ==
      Vector("2020-01-01 00:00", "2020-03-01 00:00"))
    assert(ex.values("1") ==
      Vector("2021-01-01 00:00", "2021-01-02 00:00"))
    // Fh has no ExcludeDates section: starts empty instead of refusing
    ed.setDateExclusions("Fh", "2022-05-01 00:00", "2022-05-02 00:00")
    assert(ed.variableConfigs("Fh", "ExcludeDates").values.size == 1)

    // write round-trips through the ConfigObj dialect
    val out = java.nio.file.Files.createTempDirectory("l2cfg")
      .resolve("site_v2.txt").toString
    ed.write(out)
    val back = L2ConfigsEditor.fromFile(out)
    assert(back.variableConfigs("Fco2", "ExcludeDates").values("0") ==
      Vector("2020-01-01 00:00", "2020-03-01 00:00"))
    intercept[IllegalArgumentException] { back.write(out) }

    // corrections applier: site mismatch refuses
    intercept[IllegalArgumentException] {
      L2ConfigsEditor.applyCorrections(ed, "Calperum", "Boyagin",
        Map("Fco2" -> L2ConfigsEditor.VariableCorrections()))
    }
    L2ConfigsEditor.applyCorrections(ed, "Calperum", "Calperum", Map(
      "Fh" -> L2ConfigsEditor.VariableCorrections(
        rangeCheck = Some(("-200", "700")),
        excludeDates = Seq(("2022-05-01 12:00", "2022-05-03 00:00")))))
    assert(ed.variableConfigs("Fh", "RangeCheck").scalar("upper") == "700")
    assert(ed.variableConfigs("Fh", "ExcludeDates").values("0") ==
      Vector("2022-05-01 00:00", "2022-05-03 00:00")) // merged overlap
  }

  private val l1Text =
    """[Global]
      |    site_name = Calperum
      |    time_step = 30
      |[Variables]
      |    [[Fco2]]
      |        [[[Attr]]]
      |            instrument = Li-7500A, CSAT3B
      |            height = 20m
      |            units = umol/m^2/s
      |        [[[xl]]]
      |            sheet = slow_flux
      |            name = Fc_Li7500A
      |    [[Ta_HMP_2m]]
      |        [[[Attr]]]
      |            instrument = HMP155
      |            height = 2m
      |            units = degC
      |            long_name = Air temperature
      |        [[[xl]]]
      |            sheet = slow_met
      |            name = AirTC_Avg
      |    [[NoXl]]
      |        [[[Attr]]]
      |            instrument = X
      |""".stripMargin

  test("L1 control-file parser: parse list, sheet->table, lists, xlsx dump") {
    val l1 = L1ControlFile.fromString(l1Text)
    assert(l1.site == "Calperum")
    assert(l1.parseList == Seq("Fco2", "Ta_HMP_2m")) // NoXl has no xl
    val table = l1.variableTable.toMap
    assert(table("Fco2")("instrument") == "Li-7500A,CSAT3B") // list joined
    assert(table("Fco2")("table") == "slow_flux") // sheet renamed
    assert(table("Fco2")("long_name") == "") // absent -> ""
    assert(table("Ta_HMP_2m")("long_name") == "Air temperature")
    assert(l1.globals("site_name") == "Calperum")

    val path = java.nio.file.Files.createTempDirectory("l1xl")
      .resolve("configs.xlsx").toString
    l1.writeVariablesToExcel(path)
    val back = graft.pipeline.Xlsx.readSheet(spark, path, "Variable_attrs")
    assert(back.count() == 2)
    assert(back.columns.head == "pfp_name")
    assert(back.filter(col("pfp_name") === "Fco2")
      .head().getAs[String]("table") == "slow_flux")
  }

  test("ConfigObj dialect: quoting, comments, depth rules survive round-trip") {
    val root = ConfigText.parseConfigObj(
      "a = 1 # trailing comment\nb = 'x, y', z\n[S]\n  c = 'hash # inside'\n")
    assert(root.scalar("a") == "1")
    assert(root.values("b") == Vector("x, y", "z"))
    assert(root.section("S").scalar("c") == "hash # inside")
    val again = ConfigText.parseConfigObj(ConfigText.writeConfigObj(root))
    assert(again.values("b") == Vector("x, y", "z"))
    assert(again.section("S").scalar("c") == "hash # inside")
    intercept[IllegalArgumentException] {
      ConfigText.parseConfigObj("[[TooDeep]]\n")
    }
  }

  test("ConfigObj: 1-element list (trailing comma) stays distinct from scalar") {
    val text = "a = 1,\nb = 1\nc = x, y\nq = 'a,',\nempty = ,\n"
    val root = ConfigText.parseConfigObj(text)
    // Values read identically (ConfigObj reads both via the list API)…
    assert(root.values("a") == Vector("1") && root.scalar("a") == "1")
    assert(root.values("b") == Vector("1"))
    assert(root.values("q") == Vector("a,")) // comma inside quotes ≠ marker
    assert(root.listKeys == Set("a", "q", "empty"))
    // …but the writer re-emits the trailing-comma marker, so an editor
    // rewrite can't silently convert a 1-element list to a scalar.
    // (The empty element normalizes to its quoted spelling.)
    val out = ConfigText.writeConfigObj(root)
    assert(out == "a = 1,\nb = 1\nc = x, y\nq = 'a,',\nempty = '',\n")
    // idempotence: parse(write) is a fixed point
    assert(ConfigText.writeConfigObj(ConfigText.parseConfigObj(out)) == out)
    // re-assigning a Vector(1) without the marker makes it a scalar,
    // matching ConfigObj where assigning a str does the same
    root.values("a") = Vector("2")
    root.listKeys -= "a"
    assert(ConfigText.writeConfigObj(root).startsWith("a = 2\n"))
  }

  test("YAML tree: quote- and space-bearing scalars round-trip exactly") {
    import ConfigText.{YMap, YScalar}
    val hard = Vector(
      "don't", "it''s", " padded ", "a: b", "x # not a comment",
      "-lead", "{brace}", "[bracket]", "", "*star", "&amp", "%pct",
      "tab\there", "normal")
    val root = YMap(hard.zipWithIndex.map { case (v, i) =>
      s"k$i" -> (YScalar(v): ConfigText.Yaml)
    } :+ ("nest" -> (YMap(Vector(
      "inner: key" -> YScalar("don't trim  "))): ConfigText.Yaml)))
    val text = ConfigText.writeYaml(root)
    val back = ConfigText.parseYamlTree(text)
    hard.zipWithIndex.foreach { case (v, i) =>
      assert(back(s"k$i") == YScalar(v), s"k$i corrupted on round-trip")
    }
    assert(back("nest").asInstanceOf[YMap]("inner: key") ==
      YScalar("don't trim  "))
    // idempotence
    assert(ConfigText.writeYaml(back) == text)
  }

  test("ConfigObj: quote- and space-bearing values round-trip exactly") {
    // The value classes quoting exists for: embedded quotes (one kind
    // at a time — the dialect has no escapes), padded whitespace,
    // commas, hashes, backslashes INCLUDING a trailing backslash
    // before the closing quote, and combinations.
    val hard = Vector(
      "don't", "say \"hi\"", " padded ",
      "  lead", "trail  ", "a, b", "x # not a comment", "",
      "back\\slash", "a,b\\", "C:\\data\\", "tab\there",
      "don't, really", "'", "\"", "''", "normal")
    val root = new ConfigText.Section
    hard.zipWithIndex.foreach { case (v, i) => root.values(s"k$i") = Vector(v) }
    root.values("list") = hard // same values as one list
    val text = ConfigText.writeConfigObj(root)
    val back = ConfigText.parseConfigObj(text)
    hard.zipWithIndex.foreach { case (v, i) =>
      assert(back.scalar(s"k$i") == v, s"scalar k$i corrupted on round-trip")
    }
    assert(back.values("list") == hard, "list elements corrupted on round-trip")
    // idempotence: a second write/parse cycle changes nothing
    val text2 = ConfigText.writeConfigObj(back)
    assert(text2 == text)
    // a value with BOTH quote chars cannot round-trip in this dialect:
    // the writer must refuse loudly, never corrupt on the next load
    val bad = new ConfigText.Section
    bad.values("k") = Vector("both ' and \" here")
    intercept[IllegalArgumentException] {
      ConfigText.writeConfigObj(bad)
    }
  }
}
