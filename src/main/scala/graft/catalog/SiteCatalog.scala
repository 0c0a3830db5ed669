package graft.catalog

/** Site catalog (S13/S15): per-site details normally retrieved from a
  * SPARQL knowledge graph with a local YAML mirror fallback
  * (reference: code/managers/site_details.py:56-65,191-208 and
  * code/configs/site_metadata.yml). This implementation reads the
  * local mirror — a flat two-level YAML subset parsed without external
  * dependencies (zero-egress build) — and computes the derived fields
  * (UTC offset, sunrise/sunset) in pure Scala.
  */
object SiteCatalog {

  final case class Site(
      name: String,
      latitude: Double,
      longitude: Double,
      elevation: Double,
      timeStep: Int,
      freqHz: Double,
      timezone: String,
      utcOffsetHours: Double,
      towerHeight: Option[Double],
      fluxnetId: Option[String])

  /** Minimal YAML-subset parser for the mirror format:
    *   SiteName:
    *     latitude: -34.0
    *     longitude: 140.6
    *     ...
    * (flat string/number scalars, two indent levels, '#' comments).
    */
  def parseYaml(text: String): Map[String, Map[String, String]] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var current: Option[String] = None
    text.linesIterator.foreach { raw =>
      val line = raw.replaceAll("#.*$", "")
      if (line.trim.nonEmpty) {
        val indent = line.takeWhile(_ == ' ').length
        val body = line.trim
        if (indent == 0 && body.endsWith(":")) {
          val k = body.dropRight(1).trim
          current = Some(k)
          out.getOrElseUpdate(k,
            scala.collection.mutable.LinkedHashMap.empty)
        } else if (indent > 0 && body.contains(":")) {
          val Array(k, v) = body.split(":", 2)
          current.foreach(c =>
            out(c)(k.trim) = v.trim.replaceAll("^['\"]|['\"]$", ""))
        }
      }
    }
    out.map { case (k, v) => k -> v.toMap }.toMap
  }

  def fromYaml(text: String): Seq[Site] =
    parseYaml(text).toSeq.map { case (name, f) =>
      Site(
        name = name,
        latitude = f.get("latitude").flatMap(_.toDoubleOption).getOrElse(0.0),
        longitude = f.get("longitude").flatMap(_.toDoubleOption).getOrElse(0.0),
        elevation = f.get("elevation").flatMap(_.toDoubleOption).getOrElse(0.0),
        timeStep = f.get("time_step").flatMap(_.toIntOption).getOrElse(30),
        freqHz = f.get("freq_hz").flatMap(_.toDoubleOption).getOrElse(10.0),
        timezone = f.getOrElse("timezone", "UTC"),
        utcOffsetHours = f.get("UTC_offset").orElse(f.get("utc_offset"))
          .flatMap(_.toDoubleOption).getOrElse(0.0),
        towerHeight = f.get("tower_height").flatMap(_.toDoubleOption),
        fluxnetId = f.get("fluxnet_id").filter(_.nonEmpty))
    }.sortBy(_.name)

  /** F24: standard (non-DST) UTC offset for a zone id via java.time. */
  def standardUtcOffsetHours(zoneId: String): Double = {
    val zone = java.time.ZoneId.of(zoneId)
    val rules = zone.getRules
    val now = java.time.Instant.now()
    val std = rules.getStandardOffset(now)
    std.getTotalSeconds / 3600.0
  }

  /** F24: embedded timezone polygons for the network's domain
    * (Australia) — the reference resolves lat/lon with the
    * timezonefinder polygon library (site_details.py:66,186-210);
    * offline, this table covers the flux network's footprint. The
    * surveyed straight borders ARE the real borders (WA at 129°E,
    * NT/SA and SA/QLD at 26°S, SA/NSW and QLD/SA-east at 141°E, the
    * Cameron Corner line at 29°S); the genuinely non-rectilinear
    * pieces carry polyline approximations: the QLD/NSW river border
    * rising from (149°E, 29°S) to Point Danger (153.56°E, 28.16°S) —
    * so coastal northern-NSW sites (Byron Bay band, −29 < lat <
    * −28.16) resolve to Sydney, not Brisbane — and the
    * Yancowinna/Broken Hill pocket (ACST inside NSW) as its bounding
    * polygon, listed before NSW so it wins. Victoria shares
    * Australia/Sydney's offsets, so NSW+VIC are one polygon.
    * Vertices are (lon, lat); first containing polygon wins. Sites
    * within ~0.05° of a border should still pin `time_zone` in the
    * site catalog — a catalog value always wins over this lookup. */
  val AuZonePolygons: Vector[(String, Vector[(Double, Double)])] = Vector(
    "Australia/Broken_Hill" -> Vector(
      (141.0, -32.85), (142.35, -32.85), (142.35, -30.9), (141.0, -30.9)),
    "Australia/Hobart" -> Vector(
      (143.0, -44.5), (154.5, -44.5), (154.5, -39.2), (143.0, -39.2)),
    "Australia/Perth" -> Vector(
      (112.0, -36.0), (129.0, -36.0), (129.0, -12.0), (112.0, -12.0)),
    "Australia/Darwin" -> Vector(
      (129.0, -26.0), (138.0, -26.0), (138.0, -10.5), (129.0, -10.5)),
    "Australia/Adelaide" -> Vector(
      (129.0, -38.5), (141.0, -38.5), (141.0, -26.0), (129.0, -26.0)),
    "Australia/Brisbane" -> Vector(
      (138.0, -26.0), (141.0, -26.0), (141.0, -29.0), (149.0, -29.0),
      (150.3, -28.6), (152.0, -28.35), (153.56, -28.16), (154.5, -28.0),
      (154.5, -10.5), (138.0, -10.5)),
    "Australia/Sydney" -> Vector(
      (141.0, -39.2), (154.5, -39.2), (154.5, -28.0), (153.56, -28.16),
      (152.0, -28.35), (150.3, -28.6), (149.0, -29.0), (141.0, -29.0)))

  /** Even-odd ray-cast point-in-polygon over (lon, lat) vertices.
    * Planar treatment is exact at these extents; horizontal edges are
    * skipped by the straddle test (no 0/0). */
  private def inPolygon(lon: Double, lat: Double,
      poly: Vector[(Double, Double)]): Boolean = {
    var inside = false
    var j = poly.length - 1
    var i = 0
    while (i < poly.length) {
      val (xi, yi) = poly(i); val (xj, yj) = poly(j)
      if ((yi > lat) != (yj > lat) &&
          lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** F24: lat/lon -> IANA zone via [[AuZonePolygons]]. None outside
    * the Australian bounding box or in open water between polygons. */
  def auTimeZone(lat: Double, lon: Double): Option[String] = {
    if (lat > -9.0 || lat < -44.5 || lon < 112.0 || lon > 154.5) None
    else AuZonePolygons.collectFirst {
      case (zone, poly) if inPolygon(lon, lat, poly) => zone
    }
  }

  /** Catalog-first timezone resolution: an explicit site `time_zone`
    * wins; otherwise the coordinate lookup. */
  def resolveTimeZone(catalogTz: Option[String], lat: Double,
      lon: Double): Option[String] =
    catalogTz.filter(_.nonEmpty).orElse(auTimeZone(lat, lon))
}
