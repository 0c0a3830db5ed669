package graft.catalog

import graft.pfp.PfpName

/** Per-site variable map: the config that binds each standard variable
  * name to its source (file XOR logger+table) and physical metadata —
  * with the reference's load-time validation rules (reference:
  * code/managers/metadata.py:49-52,100-126,147-179 and the Pydantic
  * rewrite code/managers/var_metadata.py:738-935):
  *
  *  - required fields present (name + units + source);
  *  - exactly one of `file` vs `logger`+`table` per entry;
  *  - standard names must parse under the PFP grammar unless the entry
  *    carries its own long_name (custom-variable escape hatch);
  *  - at most one SONIC and one IRGA instrument across the site;
  *  - a single flux-system suffix (EP/EF/DL) across flux variables.
  *
  * Violations are returned as data (a list of typed errors), not
  * thrown — config validation reports are user-facing artifacts.
  */
object VariableMap {

  final case class Entry(
      standardName: String,
      siteName: String,
      units: String,
      file: Option[String] = None,
      logger: Option[String] = None,
      table: Option[String] = None,
      height: Option[Double] = None,
      instrument: Option[String] = None,
      statisticType: Option[String] = None,
      longName: Option[String] = None)

  sealed trait Violation { def entry: String; def message: String }
  final case class MissingField(entry: String, field: String) extends Violation {
    def message = s"missing required field '$field'"
  }
  final case class SourceConflict(entry: String) extends Violation {
    def message = "exactly one of file vs logger+table required"
  }
  final case class BadName(entry: String, reason: String) extends Violation {
    def message = s"name does not parse under PFP grammar: $reason"
  }
  final case class MultipleInstruments(entry: String, kind: String,
      found: Seq[String]) extends Violation {
    def message = s"multiple $kind instruments configured: ${found.mkString(", ")}"
  }
  final case class MixedFluxSystems(entry: String, found: Seq[String])
      extends Violation {
    def message = s"mixed flux-system suffixes: ${found.mkString(", ")}"
  }

  def validate(entries: Seq[Entry],
      sonicInstruments: Set[String] = Set("CSAT3", "CSAT3B", "WM_PRO"),
      irgaInstruments: Set[String] = Set("LI7500", "LI7500A", "LI7500DS",
        "EC150", "EC155", "IRGASON")): Seq[Violation] = {
    val perEntry = entries.flatMap { e =>
      val missing = Seq(
        Option.when(e.standardName.isEmpty)(MissingField(e.standardName, "name")),
        Option.when(e.siteName.isEmpty)(MissingField(e.standardName, "site_name")),
        Option.when(e.units.isEmpty)(MissingField(e.standardName, "units"))
      ).flatten
      val srcOk = (e.file.isDefined && e.logger.isEmpty && e.table.isEmpty) ||
        (e.file.isEmpty && e.logger.isDefined && e.table.isDefined)
      val src = if (srcOk) Nil else Seq(SourceConflict(e.standardName))
      val name =
        if (e.longName.isDefined) Nil // custom-variable escape hatch
        else PfpName.parse(e.standardName) match {
          case Left(reason) => Seq(BadName(e.standardName, reason.message))
          case Right(_) => Nil
        }
      missing ++ src ++ name
    }

    def instrumentViolation(kind: String, set: Set[String]) = {
      val found = entries.flatMap(_.instrument).distinct.filter(set.contains)
      if (found.sizeIs > 1)
        Seq(MultipleInstruments("<site>", kind, found)) else Nil
    }
    val systems = entries
      .flatMap(e => PfpName.parse(e.standardName).toOption)
      .flatMap(_.system).distinct
    val fluxMix = if (systems.sizeIs > 1)
      Seq(MixedFluxSystems("<site>", systems)) else Nil

    perEntry ++ instrumentViolation("SONIC", sonicInstruments) ++
      instrumentViolation("IRGA", irgaInstruments) ++ fluxMix
  }

  /** P7: per-source translation maps (site name -> standard name),
    * grouped by file or logger/table — drives per-file usecols renames
    * (reference: metadata.py:752-931). */
  def translationBySource(entries: Seq[Entry])
      : Map[String, Map[String, String]] =
    entries.groupBy(e =>
        e.file.getOrElse(s"${e.logger.getOrElse("")}/${e.table.getOrElse("")}"))
      .map { case (src, es) =>
        src -> es.map(e => e.siteName -> e.standardName).toMap }
}
