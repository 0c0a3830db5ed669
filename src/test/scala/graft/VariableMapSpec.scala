package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.VariableMap
import graft.catalog.VariableMap._

class VariableMapSpec extends AnyFunSuite {

  private def entry(name: String, file: Option[String] = Some("a.dat"),
      logger: Option[String] = None, table: Option[String] = None,
      instrument: Option[String] = None, longName: Option[String] = None) =
    Entry(name, s"site_$name", "arb", file, logger, table,
      instrument = instrument, longName = longName)

  test("valid map passes") {
    val es = Seq(
      entry("Fco2_EP", instrument = Some("LI7500")),
      entry("Ta_HMP_2m_Av"),
      entry("Ux_CSAT3_Av", instrument = Some("CSAT3")))
    assert(VariableMap.validate(es).isEmpty)
  }

  test("file XOR logger+table enforced") {
    assert(VariableMap.validate(Seq(
      entry("Ta_HMP_2m_Av", file = Some("a.dat"), logger = Some("L"),
        table = Some("T"))))
      .exists(_.isInstanceOf[SourceConflict]))
    assert(VariableMap.validate(Seq(
      entry("Ta_HMP_2m_Av", file = None, logger = Some("L"), table = None)))
      .exists(_.isInstanceOf[SourceConflict]))
    assert(VariableMap.validate(Seq(
      entry("Ta_HMP_2m_Av", file = None, logger = Some("L"),
        table = Some("T")))).isEmpty)
  }

  test("PFP grammar enforced with long_name escape hatch") {
    assert(VariableMap.validate(Seq(entry("Ta__Av")))
      .exists(_.isInstanceOf[BadName]))
    assert(VariableMap.validate(Seq(
      entry("Ta__Av", longName = Some("custom thing")))).isEmpty)
  }

  test("single SONIC / IRGA and uniform flux suffix") {
    val twoSonics = Seq(
      entry("Ux_Av", instrument = Some("CSAT3")),
      entry("Uy_Av", instrument = Some("CSAT3B")))
    assert(VariableMap.validate(twoSonics)
      .exists(_.isInstanceOf[MultipleInstruments]))

    val mixed = Seq(entry("Fco2_EP"), entry("Fh2o_EF"))
    assert(VariableMap.validate(mixed)
      .exists(_.isInstanceOf[MixedFluxSystems]))
  }

  test("P7 translation maps group by source") {
    val es = Seq(
      entry("Ta_HMP_2m_Av", file = Some("met.dat")),
      entry("RH_HMP_2m_Av", file = Some("met.dat")),
      entry("Fco2_EP", file = None, logger = Some("L1"), table = Some("flux")))
    val t = VariableMap.translationBySource(es)
    assert(t("met.dat") == Map(
      "site_Ta_HMP_2m_Av" -> "Ta_HMP_2m_Av",
      "site_RH_HMP_2m_Av" -> "RH_HMP_2m_Av"))
    assert(t.contains("L1/flux"))
  }
}
