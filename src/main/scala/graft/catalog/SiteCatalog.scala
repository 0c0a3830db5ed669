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

  /** F24: lat/lon -> IANA zone for the network's domain (Australia) —
    * the reference resolves this with the timezonefinder polygon
    * library (site_details.py:66,186-210); offline, the state-border
    * approximation below covers the flux network's footprint with
    * deterministic, documented rules:
    *
    *  - lon < 129 (WA):                      Australia/Perth
    *  - 129-138, lat > -26 (NT):             Australia/Darwin
    *  - 129-138, lat <= -26 (SA west):       Australia/Adelaide
    *  - 138-141, lat > -26 (QLD southwest):  Australia/Brisbane
    *  - 138-141, lat <= -26 (SA east):       Australia/Adelaide
    *  - lon >= 141, lat > -29 (QLD):         Australia/Brisbane
    *  - lon >= 141, -39.2..-29 (NSW/VIC):    Australia/Sydney
    *  - lat < -39.2 (TAS):                   Australia/Hobart
    *
    * Near-border sites (e.g. the Broken Hill pocket, which keeps
    * Adelaide time inside NSW) should pin `time_zone` in the site
    * catalog — a catalog value always wins over this lookup. None
    * outside the Australian bounding box. */
  def auTimeZone(lat: Double, lon: Double): Option[String] = {
    if (lat > -9.0 || lat < -44.5 || lon < 112.0 || lon > 154.5) None
    else if (lat < -39.2) Some("Australia/Hobart")
    else if (lon < 129.0) Some("Australia/Perth")
    else if (lon < 138.0)
      Some(if (lat > -26.0) "Australia/Darwin" else "Australia/Adelaide")
    else if (lon < 141.0)
      Some(if (lat > -26.0) "Australia/Brisbane" else "Australia/Adelaide")
    else if (lat > -29.0) Some("Australia/Brisbane")
    else Some("Australia/Sydney")
  }

  /** Catalog-first timezone resolution: an explicit site `time_zone`
    * wins; otherwise the coordinate lookup. */
  def resolveTimeZone(catalogTz: Option[String], lat: Double,
      lon: Double): Option[String] =
    catalogTz.filter(_.nonEmpty).orElse(auTimeZone(lat, lon))
}
