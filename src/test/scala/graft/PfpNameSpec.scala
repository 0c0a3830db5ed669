package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pfp.PfpName

class PfpNameSpec extends AnyFunSuite {

  test("parses flux name with system suffix") {
    val p = PfpName.parse("Fco2_EP").toOption.get
    assert(p.quantity == "Fco2" && p.system.contains("EP"))
  }

  test("parses instrument + location + process") {
    val p = PfpName.parse("Ta_HMP_2m_Av").toOption.get
    assert(p.quantity == "Ta" && p.instrument.contains("HMP"))
    assert(p.verticalLocation.contains("2m"))
    assert(p.process.contains("Av"))
    assert(p.heightMetres.contains(2.0))
  }

  test("parses soil depth range with replicate") {
    val p = PfpName.parse("Sws_0-30cm_Av").toOption.get
    assert(p.verticalLocation.contains("0-30cm"))
    assert(p.heightMetres.contains(0.15)) // midpoint of 0-30 cm
  }

  test("parses horizontal location and replicate digit") {
    val p = PfpName.parse("Ts_10cma2_Av").toOption.get
    assert(p.verticalLocation.contains("10cm"))
    assert(p.horizontalLocation.contains("a"))
    assert(p.replicate.contains(2))
  }

  test("round-trips through render") {
    for (n <- Seq("Fco2_EP", "Ta_HMP_2m_Av", "Sws_0-30cm_Av", "CO2_IRGA_Vr"))
      assert(PfpName.parse(n).toOption.get.render == n)
  }

  test("rejects malformed names") {
    assert(PfpName.parse("").isLeft)
    assert(PfpName.parse("Ta__Av").isLeft)
    assert(PfpName.parse("Ta_2m_3m").isLeft)   // duplicate location
    assert(PfpName.parse("Fco2_EP_EF").isLeft) // duplicate system
  }

  test("F29 depth cm->m rename uses midpoints") {
    assert(PfpName.depthCmToM("Sws_30cm_Av") == "Sws_0.3m_Av")
    assert(PfpName.depthCmToM("Sws_100cm_Av") == "Sws_1m_Av")
    assert(PfpName.depthCmToM("Ta_HMP_2m_Av") == "Ta_HMP_2m_Av") // no-op
  }

  test("typed error taxonomy mirrors the reference error classes") {
    import PfpName._
    assert(parse("") == Left(EmptyName))
    assert(parse("Ta__Av") == Left(EmptyComponent("Ta__Av")))
    assert(parse("Ta_2m_3m") == Left(DuplicateComponent("location", "Ta_2m_3m")))
    assert(parse("Fco2_EP_EF") == Left(DuplicateComponent("system", "Fco2_EP_EF")))
    // vocabulary membership (metadata.py:1098-1101)
    assert(parse("Xx_2m", Set("Ta", "RH")) == Left(InvalidQuantity("Xx")))
    assert(parse("Ta_2m", Set("Ta", "RH")).isRight)
    // location error classes (metadata.py:1201-1227)
    assert(parse("Sws_0-30-60cm_Av") ==
      Left(TooManyHeightIdentifiers("0-30-60cm")))
    assert(parse("Sws_HMP_abccm_Av") == Left(NonNumericHeight("abccm")))
    assert(parse("Ta_HMP_2m$_Av") == Left(NonAlphaHorizontal("$")))
    // like the reference, a digit straight after the units is a
    // replicate with no horizontal id (metadata.py:1252-1283)
    assert(parse("Ta_HMP_2m3_Av").toOption.get.replicate.contains(3))
    // every error renders the reference-style message
    assert(parse("Sws_0-30-60cm").swap.toOption.get.message
      .contains("maximum of two height / depth identifiers"))
  }

  test("variance/count/QC attr rewrites (metadata.py:1299-1364)") {
    import graft.core.VariableMeta
    assert(PfpName.convertVarianceUnits("degC") == "degC^2")
    assert(PfpName.convertVarianceUnits("m^2/s^2", toVariance = false)
      == "m/s")
    intercept[NoSuchElementException] {
      PfpName.convertVarianceUnits("furlongs")
    }
    val base = VariableMeta("CO2_IRGA_Ct", "mg/m^3", "Ct",
      longName = Some("CO2 concentration"),
      standardName = Some("mass_concentration_of_co2"),
      plausibleMin = Some(300.0), plausibleMax = Some(900.0))
    val ct = PfpName.rewriteProcessAttrs(base, Some("Ct"))
    assert(ct.units == "1"
      && ct.longName.contains("Number of samples of CO2 concentration")
      && ct.standardName.isEmpty
      && ct.plausibleMin.contains(0.0) && ct.plausibleMax.isEmpty)
    val qc = PfpName.rewriteProcessAttrs(
      base.copy(name = "CO2_IRGA_QCFlag"), Some("QCFlag"))
    assert(qc.units == "1"
      && qc.longName.contains("QC flag value of CO2 concentration"))
    val vr = PfpName.rewriteProcessAttrs(
      base.copy(name = "CO2_IRGA_Vr"), Some("Vr"))
    assert(vr.units == "mg^2/m^6")
  }

  test("Vr -> Sd catalog amendment keeps metadata in lockstep") {
    import graft.core.VariableMeta
    import graft.catalog.VariableCatalog
    val vars = Seq(
      VariableMeta("Ux_SONIC_Vr", "m^2/s^2", "Vr"),
      VariableMeta("Ta_HMP_2m_Av", "degC", "Av"))
    val (amended, renames) = VariableCatalog.varianceToStdev(vars)
    assert(renames == Map("Ux_SONIC_Vr" -> "Ux_SONIC_Sd"))
    val sd = amended.find(_.name == "Ux_SONIC_Sd").get
    assert(sd.units == "m/s" && sd.sampling == "Sd")
    assert(amended.exists(_.name == "Ta_HMP_2m_Av")) // untouched
  }

  test("accepts the reference's N.m dangling-dot depth form on input") {
    // The reference's cm->m rename rstrips trailing zeros but leaves
    // the dot on whole-metre values (convert_calc_filter.py:417-465),
    // emitting e.g. Sws_1.m_Av. We accept it and store the clean form.
    val p = PfpName.parse("Sws_1.m_Av").toOption.get
    assert(p.verticalLocation.contains("1m"))
    assert(p.heightMetres.contains(1.0))
    assert(p.process.contains("Av"))
    assert(p.render == "Sws_1m_Av") // emitted clean, never 1.m

    // range + horizontal + replicate variants of the same fencepost
    val r = PfpName.parse("Sws_0.-1.cmN2_Av").toOption.get
    assert(r.verticalLocation.contains("0-1cm"))
    assert(r.horizontalLocation.contains("N") && r.replicate.contains(2))

    // proper decimals are untouched, and a bare dot is still rejected
    assert(PfpName.parse("Sws_0.3m_Av").toOption.get
      .verticalLocation.contains("0.3m"))
    assert(PfpName.parse("Sws_.m_Av").isLeft)
  }
}
