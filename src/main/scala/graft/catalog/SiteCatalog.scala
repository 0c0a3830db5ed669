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
}
