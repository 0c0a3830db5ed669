package graft.functions

import java.time.{Duration, LocalDate, LocalDateTime, LocalTime}

/** F25: sunrise/sunset from the public NOAA solar position algorithm
  * (Meeus-based, as published in the NOAA Solar Calculator) — replaces
  * the reference's ephem dependency (convert_calc_filter.py:58-115).
  * Driver-side; feeds the site-details products (K8/K9).
  */
object Solar {

  private def toRad(d: Double) = math.toRadians(d)
  private def toDeg(r: Double) = math.toDegrees(r)

  /** Julian day number at 0h UT for a calendar date. */
  def julianDay(date: LocalDate): Double = {
    var y = date.getYear
    var m = date.getMonthValue
    val d = date.getDayOfMonth
    if (m <= 2) { y -= 1; m += 12 }
    val a = y / 100
    val b = 2 - a + a / 4
    (365.25 * (y + 4716)).toInt + (30.6001 * (m + 1)).toInt + d + b - 1524.5
  }

  /** Solar declination (deg) and equation of time (minutes). */
  def declinationAndEot(date: LocalDate): (Double, Double) = {
    val jc = (julianDay(date) - 2451545.0) / 36525.0
    val gml = (280.46646 + jc * (36000.76983 + jc * 0.0003032)) % 360.0
    val gma = 357.52911 + jc * (35999.05029 - 0.0001537 * jc)
    val ecc = 0.016708634 - jc * (0.000042037 + 0.0000001267 * jc)
    val ctr = math.sin(toRad(gma)) * (1.914602 - jc * (0.004817 + 0.000014 * jc)) +
      math.sin(toRad(2 * gma)) * (0.019993 - 0.000101 * jc) +
      math.sin(toRad(3 * gma)) * 0.000289
    val tl = gml + ctr                      // true longitude
    val al = tl - 0.00569 -
      0.00478 * math.sin(toRad(125.04 - 1934.136 * jc))  // apparent
    val moe = 23.0 + (26.0 + (21.448 - jc * (46.815 +
      jc * (0.00059 - jc * 0.001813))) / 60.0) / 60.0
    val oc = moe + 0.00256 * math.cos(toRad(125.04 - 1934.136 * jc))
    val decl = toDeg(math.asin(math.sin(toRad(oc)) * math.sin(toRad(al))))
    val y = math.tan(toRad(oc / 2)) * math.tan(toRad(oc / 2))
    val eot = 4.0 * toDeg(
      y * math.sin(2 * toRad(gml)) - 2 * ecc * math.sin(toRad(gma)) +
        4 * ecc * y * math.sin(toRad(gma)) * math.cos(2 * toRad(gml)) -
        0.5 * y * y * math.sin(4 * toRad(gml)) -
        1.25 * ecc * ecc * math.sin(2 * toRad(gma)))
    (decl, eot)
  }

  /** Sunrise/sunset in local wall-clock time for a UTC offset (hours);
    * None in polar day/night. Zenith 90.833 deg (refraction + disk). */
  def sunriseSunset(date: LocalDate, latDeg: Double, lonDeg: Double,
      utcOffsetHours: Double): Option[(LocalDateTime, LocalDateTime)] = {
    val (decl, eot) = declinationAndEot(date)
    val cosHa = (math.cos(toRad(90.833)) -
      math.sin(toRad(latDeg)) * math.sin(toRad(decl))) /
      (math.cos(toRad(latDeg)) * math.cos(toRad(decl)))
    if (cosHa < -1.0 || cosHa > 1.0) return None
    val ha = toDeg(math.acos(cosHa))
    val noonMinUtc = 720.0 - 4.0 * lonDeg - eot
    val riseMin = noonMinUtc - 4.0 * ha + utcOffsetHours * 60.0
    val setMin = noonMinUtc + 4.0 * ha + utcOffsetHours * 60.0
    def at(min: Double): LocalDateTime =
      LocalDateTime.of(date, LocalTime.MIDNIGHT)
        .plus(Duration.ofSeconds(math.round(min * 60.0)))
    Some((at(riseMin), at(setMin)))
  }
}
