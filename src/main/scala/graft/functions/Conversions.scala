package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unit-conversion and derived-quantity expression library.
  *
  * Re-expresses the scalar function surface of the reference
  * (`code/data_constructors/convert_calc_filter.py:31-384`) as native
  * Spark `Column` expressions — F1–F21 in SURVEY.md §2.10. Everything
  * here stays inside whole-stage codegen (no UDFs): each function
  * composes built-in arithmetic/`exp`/`log` expressions, so Catalyst
  * constant-folds the unit constants and Tungsten codegens the rest.
  *
  * All functions are null-propagating (Spark arithmetic on null yields
  * null), matching the reference's NaN-propagation through pandas ops.
  */
object Conversions {

  /** Physical constants — convert_calc_filter.py:31-45. */
  object Const {
    val Co2MolarMassG = 44.0     // g/mol
    val H2oMolarMassG = 18.0     // g/mol
    val KelvinOffset  = 273.15   // K at 0 degC
    val GasConstant   = 8.3143   // J/mol/K
  }
  import Const._

  // --- F1-F11: unit conversions (convert_calc_filter.py:157-274) ---

  /** F1: CO2 flux mg/m^2/s -> umol/m^2/s. */
  def co2FluxMgToUmol(c: Column): Column = c * 1000.0 / Co2MolarMassG

  /** F2: CO2 density mmol/m^3 -> mg/m^3. */
  def co2DensityMmolToMg(c: Column): Column = c * Co2MolarMassG

  /** F3: H2O density mmol/m^3 -> g/m^3 (and kg/m^3 -> g/m^3). */
  def h2oDensityMmolToG(c: Column): Column = c * H2oMolarMassG / 1000.0
  def h2oDensityKgToG(c: Column): Column = c * 1000.0

  /** F4: fraction -> percent (signal strength, RH). */
  def fracToPercent(c: Column): Column = c * 100.0

  /** F5: percent -> fraction (soil water content). */
  def percentToFrac(c: Column): Column = c / 100.0

  /** F6: precipitation pulse count -> mm (tip magnitude mm/pulse). */
  def pulsesToMm(c: Column, mmPerPulse: Double = 0.2): Column = c * mmPerPulse

  /** F7: pressure Pa -> kPa; hPa -> kPa. */
  def paToKpa(c: Column): Column = c / 1000.0
  def hpaToKpa(c: Column): Column = c / 10.0

  /** F8: temperature K -> degC. */
  def kelvinToCelsius(c: Column): Column = c - KelvinOffset

  /** F9: variance <-> standard deviation. */
  def varianceToStdev(c: Column): Column = sqrt(c)
  def stdevToVariance(c: Column): Column = c * c

  /** F11: convert a VARIANCE column whose base quantity needs a unit
    * conversion: sqrt to stdev, convert in standard units, square back
    * to variance (the reference applies base conversions to variance
    * variables this way — convert_calc_filter.py:157-274 with the
    * variance-unit bookkeeping of metadata.py:1299-1324). Returns the
    * converted variance column; pair with
    * [[graft.pfp.PfpName.convertVarianceUnits]] for the units string. */
  def convertVariance(c: Column, baseConversion: Column => Column): Column =
    stdevToVariance(baseConversion(varianceToStdev(c)))

  /** F10: diagnostic valid-count -> invalid-count, n = freq_hz*step*60. */
  def diagnosticValidToInvalid(c: Column, freqHz: Double, stepMin: Double): Column =
    lit(freqHz * stepMin * 60.0) - c

  // --- F13-F21: derived met quantities (convert_calc_filter.py:287-361) ---

  /** F13: saturation vapour pressure (kPa), Buck (1996); Ta in degC. */
  def saturationVapourPressure(ta: Column): Column =
    lit(0.61121) * exp((lit(18.678) - ta / 234.5) * (ta / (lit(257.14) + ta)))

  /** F14: actual vapour pressure from RH (%): e = es * RH / 100. */
  def vapourPressure(ta: Column, rh: Column): Column =
    saturationVapourPressure(ta) * rh / 100.0

  /** F15: molar density of air (mol/m^3): ps kPa, Ta degC. */
  def molarDensity(ps: Column, ta: Column): Column =
    ps * 1000.0 / ((ta + KelvinOffset) * GasConstant)

  /** F16: absolute humidity (g/m^3) from RH. */
  def ahFromRh(ta: Column, rh: Column, ps: Column): Column =
    vapourPressure(ta, rh) / ps * molarDensity(ps, ta) * H2oMolarMassG

  /** F17: relative humidity (%) from AH (g/m^3). */
  def rhFromAh(ta: Column, ah: Column, ps: Column): Column =
    ah / H2oMolarMassG / molarDensity(ps, ta) * ps /
      saturationVapourPressure(ta) * 100.0

  /** F18: dew point (degC) from vapour pressure e (kPa). */
  def dewPoint(e: Column): Column =
    lit(243.5) * log(e / 0.61121) / (lit(17.502) - log(e / 0.61121))

  /** F19: vapour pressure deficit (kPa). */
  def vpd(ta: Column, rh: Column): Column =
    saturationVapourPressure(ta) - vapourPressure(ta, rh)

  /** F20: CO2 mole fraction (umol/mol) from mass density (mg/m^3). */
  def co2MoleFractionFromDensity(co2Mg: Column, ps: Column, ta: Column): Column =
    co2Mg / Co2MolarMassG / molarDensity(ps, ta) * 1000.0

  /** F20 inverse: CO2 mass density (mg/m^3) from mole fraction. */
  def co2DensityFromMoleFraction(co2Umol: Column, ps: Column, ta: Column): Column =
    co2Umol * Co2MolarMassG * molarDensity(ps, ta) / 1000.0

  /** F21: friction velocity from momentum flux and air density. */
  def ustarFromTauRho(tau: Column, rho: Column): Column = sqrt(abs(tau) / rho)

  /** F12/F22-style dispatch: canonical-quantity -> conversion, keyed the
    * way the reference keys its registry (convert_calc_filter.py:241-263).
    */
  val byQuantity: Map[String, Column => Column] = Map(
    "Fco2_mg"   -> co2FluxMgToUmol _,
    "CO2_mmol"  -> co2DensityMmolToMg _,
    "AH_mmol"   -> h2oDensityMmolToG _,
    "AH_kg"     -> h2oDensityKgToG _,
    "Sig_frac"  -> fracToPercent _,
    "RH_frac"   -> fracToPercent _,
    "Sws_pct"   -> percentToFrac _,
    "Precip_ct" -> (c => pulsesToMm(c)),
    "ps_Pa"     -> paToKpa _,
    "ps_hPa"    -> hpaToKpa _,
    "Ta_K"      -> kelvinToCelsius _,
  )
}
