package graft.catalog

import graft.core.VariableMeta
import graft.pfp.PfpName

/** Driver-side variable-catalog transforms (P6-P9): the reference's
  * pure-metadata computations that pick and rename columns before any
  * data-plane work — nearest-height selection, suffix normalisation,
  * generic-name mapping. Catalogs are tiny (~100 vars/site), so these
  * run driver-side and emit select/rename lists for the data plane.
  */
object VariableCatalog {

  final case class Entry(meta: VariableMeta, parsed: PfpName.Parsed) {
    def name: String = meta.name
    def height: Option[Double] = parsed.heightMetres
  }

  def parse(vars: Seq[VariableMeta]): Seq[Entry] =
    vars.flatMap(v => PfpName.parse(v.name).toOption.map(Entry(v, _)))

  /** J7/P6: choose the variable of `quantity` nearest `targetHeight`,
    * preferring same instrument, then same height any instrument, then
    * min |height - target| with name tiebreak (reference:
    * nc_toa5_constructor.py:187-294). */
  def nearestHeight(entries: Seq[Entry], quantity: String,
      targetHeight: Double, instrument: Option[String] = None)
      : Option[Entry] = {
    val cands = entries.filter(_.parsed.quantity == quantity)
    def dist(e: Entry): Double =
      e.height.map(h => math.abs(h - targetHeight)).getOrElse(Double.MaxValue)
    val sameInst = instrument.map(i =>
      cands.filter(_.parsed.instrument.contains(i))).getOrElse(Nil)
    val pool = if (sameInst.nonEmpty) sameInst else cands
    pool.sortBy(e => (dist(e), e.name)).headOption
  }

  /** P8: suffix-normalisation rename map — strip flux-system suffixes
    * (_EP/_EF/_DL) from flux vars, `_Av` process suffixes everywhere,
    * vertical ids from met vars; `Wd_SONIC` -> `Wd`; first precip
    * replicate -> `Precip` (reference: nc_toa5_constructor.py:298-368).
    */
  def normalisationRenames(entries: Seq[Entry]): Map[String, String] = {
    val renames = entries.flatMap { e =>
      val p = e.parsed
      val stripped = p.copy(
        system = None,
        process = p.process.filter(_ != "Av"),
        instrument = p.instrument.filterNot(_ == "SONIC"),
        verticalLocation =
          if (Set("Ta", "RH", "AH", "Wd", "Ws").contains(p.quantity)) None
          else p.verticalLocation,
        horizontalLocation =
          if (Set("Ta", "RH", "AH", "Wd", "Ws").contains(p.quantity)) None
          else p.horizontalLocation,
        replicate =
          if (Set("Ta", "RH", "AH", "Wd", "Ws").contains(p.quantity)) None
          else p.replicate)
      val newName = stripped.render
      if (newName != e.name) Some(e.name -> newName) else None
    }.toMap
    dedupeTargets(renames)
  }

  /** Keep rename targets unique: when several sources map to one
    * target, only the lexicographically-first source renames (the
    * reference keeps the first replicate). */
  private def dedupeTargets(renames: Map[String, String])
      : Map[String, String] =
    renames.toSeq.sortBy(_._1).groupBy(_._2).flatMap {
      case (_, group) => group.take(1)
    }

  /** L1 variance -> standard-deviation amendment over a whole catalog
    * (SURVEY §7.4#9): every `_Vr` variable is renamed `_Sd` with its
    * units converted back from variance units and its statistic set
    * to `Sd` — metadata moves in lockstep with the data-plane rename.
    * Returns (amended metas, rename map for the frame columns).
    * Reference: metadata.py:676-690 + convert_variance_units
    * (metadata.py:1299-1324). */
  def varianceToStdev(vars: Seq[VariableMeta])
      : (Seq[VariableMeta], Map[String, String]) = {
    val amended = vars.map(PfpName.varianceToStdev)
    val renames = vars.zip(amended).collect {
      case (before, after) if before.name != after.name =>
        before.name -> after.name
    }.toMap
    (amended, renames)
  }

  /** Process-suffix attribute rewrites applied catalog-wide: each
    * variable's attrs amended per its parsed process suffix
    * (Vr/Ct/QCFlag — metadata.py:1057-1065, 1327-1364). */
  def rewriteProcessAttrs(vars: Seq[VariableMeta]): Seq[VariableMeta] =
    vars.map { v =>
      PfpName.parse(v.name) match {
        case Right(p) => PfpName.rewriteProcessAttrs(v, p.process)
        case Left(_) => v
      }
    }

  /** P9: generic (dashboard) name mapping — quantity + indexed
    * replicate across height-sorted groups, e.g. soil sensors become
    * `Sws_1..n` ordered by depth then replicate (reference:
    * grafana_variable_mapper2.py:77-308). */
  def genericNames(entries: Seq[Entry], quantities: Set[String])
      : Map[String, String] =
    entries.filter(e => quantities.contains(e.parsed.quantity))
      .groupBy(_.parsed.quantity).flatMap { case (q, group) =>
        val ordered = group.sortBy(e =>
          (e.height.getOrElse(Double.MaxValue),
            e.parsed.replicate.getOrElse(0), e.name))
        if (ordered.sizeIs == 1) Seq(ordered.head.name -> q)
        else ordered.zipWithIndex.map { case (e, i) =>
          e.name -> s"${q}_${i + 1}" }
      }
}
