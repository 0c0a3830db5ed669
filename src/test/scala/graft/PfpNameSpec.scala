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
}
