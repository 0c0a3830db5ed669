package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.rtmc.{RtmcProject, RtmcSyntax}

/** RTMC project editor + syntax generator
  * (reference: rtmc_xml_parser.py, rtmc_xml_writer.py:150-170). Pure
  * driver-side DOM/string work — no Spark session needed. */
class RtmcSpec extends AnyFunSuite {

  private val template =
    """<RTMCProjectFile>
      | <snapshot_directory>C:\old\snap</snapshot_directory>
      | <Screens>
      |  <screen screen_name="System">
      |   <snapshot_enabled>true</snapshot_enabled>
      |   <Components>
      |    <component type="10101" name="Digital1">
      |      <comp_name_manually_editted>false</comp_name_manually_editted>
      |      <calculation>old calc</calculation>
      |    </component>
      |    <component type="10108" name="Segmented Time1">
      |      <comp_name_manually_editted>true</comp_name_manually_editted>
      |      <calculation>t</calculation>
      |      <time_offset_with_units>600</time_offset_with_units>
      |      <time_offset_units>minutes</time_offset_units>
      |    </component>
      |    <component type="10702" name="Image2">
      |      <image_name>C:\img\old_tower.jpg</image_name>
      |    </component>
      |    <component type="10602" name="Time Series Chart1">
      |      <Traces count="2">
      |        <traces label="Signal">
      |          <calculation>sig</calculation>
      |          <trace vertical-axis="1" title="Sig"><pen colour="RGBA(1,2,3,1)"/></trace>
      |        </traces>
      |        <traces label="Other">
      |          <calculation>oth</calculation>
      |          <trace vertical-axis="0" title="Oth"><pen colour="RGBA(4,5,6,1)"/></trace>
      |        </traces>
      |      </Traces>
      |    </component>
      |    <component type="10606" name="Wind Rose1">
      |      <calculation>w</calculation>
      |      <wind_direction_column_name>Wd_old</wind_direction_column_name>
      |      <wind_speed_column_name>Ws_old</wind_speed_column_name>
      |    </component>
      |    <component type="10002" name="Basic Status Bar1">
      |      <calculation>c</calculation>
      |      <max_pointer><calculation>maxcalc</calculation></max_pointer>
      |      <min_pointer><calculation>mincalc</calculation></min_pointer>
      |      <Pointers><pointer><calculation>ptr</calculation></pointer></Pointers>
      |    </component>
      |    <component type="10806" name="Group1">
      |      <Components>
      |        <component type="10101" name="GroupedDigital">
      |          <calculation>g</calculation>
      |        </component>
      |      </Components>
      |    </component>
      |   </Components>
      |  </screen>
      | </Screens>
      | <Sources>
      |  <source name="DataFile"><settings file-name="C:\old\data.dat"/></source>
      |  <source name="DetailsFile"><settings file-name="C:\old\details.dat"/></source>
      | </Sources>
      |</RTMCProjectFile>
      |""".stripMargin

  test("tree walk: screens, typed components, group descent, edits") {
    val p = RtmcProject.parse(template)
    assert(p.screenNames == Seq("System"))
    assert(p.components("System").length == 7)
    val digitals = p.components("System", Some("Digital"))
    assert(digitals.map(_.getAttribute("name")) ==
      Seq("Digital1", "GroupedDigital"))
    assert(p.components("System", Some("Digital"), lookInGroups = false)
      .map(_.getAttribute("name")) == Seq("Digital1"))
    assert(p.editedComponentNames("System") == Seq("Segmented Time1"))
    intercept[NoSuchElementException] {
      p.componentByName("System", "Nope")
    }
    intercept[NoSuchElementException] { p.screenElement("NoScreen") }
  }

  test("editors: digital, time, image, chart, wind rose, status bar") {
    import graft.rtmc._
    val p = RtmcProject.parse(template)

    val dig = p.editorByName("System", "Digital1")
    assert(dig.isInstanceOf[DigitalEditor])
    assert(dig.calculationText.contains("old calc"))
    dig.setCalculationText("new calc")
    assert(dig.calculationText.contains("new calc"))

    val time = p.editorByName("System", "Segmented Time1")
      .asInstanceOf[TimeEditor]
    assert(time.offsetText.contains("600"))
    time.setOffsetText("-570")
    time.setOffsetUnitsText("minutes")
    assert(time.offsetText.contains("-570"))

    val img = p.editorByName("System", "Image2").asInstanceOf[ImageEditor]
    img.setImageName("C:\\img\\Calperum_tower.jpg")
    assert(img.imageName.contains("C:\\img\\Calperum_tower.jpg"))

    val chart = p.editorByName("System", "Time Series Chart1")
      .asInstanceOf[TimeSeriesChartEditor]
    assert(chart.traceLabels == Seq("Signal", "Other"))
    assert(chart.axisByLabel("Signal") == "right")
    assert(chart.axisByLabel("Other") == "left")
    assert(chart.traceCalculation("Signal") == "sig")
    chart.setTraceCalculation("Signal", "sig2", Some("Signal2"))
    assert(chart.traceCalculation("Signal2") == "sig2")
    chart.setTraceAttributes("Other", rgb = Some("RGBA(9,9,9,1)"),
      title = Some("Other T"))
    chart.duplicateTrace("Other", "Other Copy")
    assert(chart.traceLabels == Seq("Signal2", "Other", "Other Copy"))
    assert(chart.traceByLabel("Other Copy").getAttribute("label")
      == "Other Copy")
    // count attribute maintained like the reference
    assert(p.componentByName("System", "Time Series Chart1")
      .getElementsByTagName("Traces").item(0)
      .getAttributes.getNamedItem("count").getNodeValue == "3")
    chart.dropTrace("Other Copy")
    assert(chart.traceLabels == Seq("Signal2", "Other"))

    val rose = p.editorByName("System", "Wind Rose1")
      .asInstanceOf[WindRoseEditor]
    rose.setWindDirColumn("Wd_SONIC_Av")
    rose.setWindSpdColumn("Ws_SONIC_Av")
    assert(rose.windDirColumn.contains("Wd_SONIC_Av"))

    val bar = p.editorByName("System", "Basic Status Bar1")
      .asInstanceOf[BasicStatusBarEditor]
    assert(bar.pointerCalculationText(Some("max")) == "maxcalc")
    assert(bar.pointerCalculationText(None) == "ptr")
    bar.setPointerCalculationText(Some("min"), "m2")
    assert(bar.pointerCalculationText(Some("min")) == "m2")
  }

  test("file sources, settings, per-site retarget") {
    val p = RtmcProject.parse(template)
    assert(p.fileSource("data").sourceFile == "C:\\old\\data.dat")
    intercept[NoSuchElementException] { p.fileSource("images") }
    p.retargetSite("Calperum", "C:\\data\\", "C:\\snaps\\")
    assert(p.fileSource("data").sourceFile ==
      "C:\\data\\Calperum_merged_std.dat")
    assert(p.fileSource("details").sourceFile ==
      "C:\\data\\Calperum_details.dat")
    assert(p.basicSettings.snapshotDestination
      .contains("C:\\snaps\\Calperum"))
    assert(p.basicSettings.snapshotScreenState("System") == "true")
    p.basicSettings.setSnapshotScreenState("System", "false")
    assert(p.basicSettings.snapshotScreenState("System") == "false")
  }

  test("write guards and edit roundtrip") {
    val dir = Files.createTempDirectory("rtmc")
    val tpl = dir.resolve("Template.rtmc2")
    Files.write(tpl, template.getBytes(StandardCharsets.UTF_8))
    val p = RtmcProject.load(tpl.toString)
    p.editorByName("System", "Digital1").setCalculationText("edited!")
    intercept[IllegalArgumentException] {
      p.write(dir.resolve("out.xml").toString) // wrong extension
    }
    intercept[IllegalArgumentException] {
      p.write(tpl.toString) // no template overwrite
    }
    intercept[java.io.FileNotFoundException] {
      p.write(dir.resolve("missing/out.rtmc2").toString)
    }
    val out = dir.resolve("Calperum.rtmc2")
    p.write(out.toString)
    val back = RtmcProject.load(out.toString)
    assert(back.editorByName("System", "Digital1")
      .calculationText.contains("edited!"))
  }

  test("syntax generator: aliases, alarms, energy-balance calcs") {
    assert(RtmcSyntax.aliasString(Seq("Ta-2m", "RH")) ==
      "Alias(Ta_2m,\"DataFile:merged.Ta-2m\");\r\n" +
      "Alias(RH,\"DataFile:merged.RH\");")
    assert(RtmcSyntax.noDataStatusString("Calperum_L1", "slow") ==
      "\"LinuxServer:Calperum_L1.slow\"")
    assert(RtmcSyntax.commStatusString("Calperum_L1") ==
      "\"Server:__statistics__.Calperum_L1_std.Collection State\" > 2 ")

    val avg = RtmcSyntax.aliasedOutput(Seq("Fh", "Fe"))
    assert(avg.evalString == "AvgSpa(Fh,Fe)")
    val one = RtmcSyntax.aliasedOutput(Seq("Sig_IRGA"))
    assert(one.evalString == "Sig_IRGA")
    assert(one.asString ==
      "Alias(Sig_IRGA,\"DataFile:merged.Sig_IRGA\");\r\n\r\nSig_IRGA")

    val scaled = RtmcSyntax.aliasedOutput(Seq("Fsd"),
      scaledToRangeFlag = true)
    assert(scaled.startCond.contains("StartAtRecord(0,0,OrderCollected);"))
    assert(scaled.evalString ==
      "(Fsd - MinRun(Fsd)) / (MaxRun(Fsd) - MinRun(Fsd))")

    val nr = RtmcSyntax.netRadiation()
    assert(nr.evalString == "Fsd-Fsu+Fld-Flu")
    assert(nr.aliasString.linesIterator.size == 4)
    val nrCuml = RtmcSyntax.netRadiation(cuml = true)
    assert(nrCuml.evalString ==
      "TotalOverTimeWithReset(\n(\nFsd-Fsu+Fld-Flu\n)*1800/10^6,\n" +
      "Timestamp(Fsd),\nRESET_DAILY\n)")

    val stor = RtmcSyntax.soilHeatStorage(Seq("Ts1", "Ts2"))
    assert(stor.aliasString.endsWith("Alias(Cp,1800);"))
    assert(stor.evalString ==
      "Cp*(\nAvgSpa(Ts1,Ts2)-\nLast(AvgSpa(Ts1,Ts2))\n)/(1800*0.08)")

    val resid = RtmcSyntax.energyBalanceResidual(Seq("Fg1", "Fg2"),
      Some(Seq("Ts1")))
    assert(resid.evalString.startsWith("Fsd-Fsu+Fld-Flu-\n(\nFh+Fe+\n("))
    assert(resid.aliasString.contains(
      "Alias(Fg1,\"DataFile:merged.Fg1\");"))

    val avail = RtmcSyntax.availableEnergy(Seq("Fg1"))
    assert(avail.evalString ==
      "(Fsd-Fsu+Fld-Flu)-\n(\nFg1\n)")
  }
}
