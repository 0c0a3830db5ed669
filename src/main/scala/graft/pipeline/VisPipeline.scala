package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.catalog.VariableCatalog
import graft.core.{TableMeta, VariableMeta}
import graft.functions.Conversions
import graft.operators.TimeSeriesOps

/** E2 visualisation-product pipeline (reference:
  * code/data_constructors/nc_toa5_constructor.py:57-127): read the
  * newest yearly lake partitions, drop extraneous variables (P6),
  * rename to generic names (P8), range-mask against the standard
  * catalog (P5), derive missing met quantities (F22), and emit a TOA5
  * extract (K1/K2).
  */
object VisPipeline {

  /** P6: keep one variable per target quantity (nearest flux height,
    * instrument-preferred), drop QC flags and std-dev companions. */
  def selectVariables(c: L1Pipeline.Conditioned, targets: Seq[String],
      fluxHeight: Double): L1Pipeline.Conditioned = {
    val entries = VariableCatalog.parse(c.meta.variables)
      .filterNot(e => e.name.endsWith("_QCFlag") ||
        e.parsed.process.contains("Sd") || e.parsed.process.contains("Vr"))
    val chosen = targets.flatMap(q =>
      VariableCatalog.nearestHeight(entries, q, fluxHeight))
    val names = chosen.map(_.name).distinct
    L1Pipeline.Conditioned(
      c.df.select((c.df.columns.head +: names).map(col): _*),
      c.meta.subset(names))
  }

  /** P8: apply normalisation renames to frame + catalog. */
  def normalise(c: L1Pipeline.Conditioned): L1Pipeline.Conditioned = {
    val renames = VariableCatalog.normalisationRenames(
      VariableCatalog.parse(c.meta.variables))
    val df = renames.foldLeft(c.df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d }
    L1Pipeline.Conditioned(df, c.meta.withRenames(renames))
  }

  /** F22: derive missing quantities when their inputs are present —
    * the signature-introspection dispatch of the reference expressed
    * as a declarative (name, inputs, expr) registry. */
  val derivations: Seq[(String, Seq[String], Seq[Column] => Column)] = Seq(
    ("VPD", Seq("Ta", "RH"), in => Conversions.vpd(in(0), in(1))),
    ("AH", Seq("Ta", "RH", "ps"), in =>
      Conversions.ahFromRh(in(0), in(1), in(2))),
    ("RH", Seq("Ta", "AH", "ps"), in =>
      Conversions.rhFromAh(in(0), in(1), in(2))),
    ("Td", Seq("Ta", "RH"), in =>
      Conversions.dewPoint(Conversions.vapourPressure(in(0), in(1)))))

  def deriveMissing(c: L1Pipeline.Conditioned): L1Pipeline.Conditioned = {
    // Resolve inputs by parsed QUANTITY (Ta matches Ta_HMP etc.) —
    // the reference wires derivation inputs from whichever column
    // carries the quantity, not by literal name.
    val byQuantity = VariableCatalog.parse(c.meta.variables)
      .groupBy(_.parsed.quantity)
      .map { case (q, g) => q -> g.minBy(_.name).name }
    val (df, added) = derivations.foldLeft((c.df, Seq.empty[VariableMeta])) {
      case ((d, acc), (name, inputs, f)) =>
        if (!byQuantity.contains(name) && inputs.forall(byQuantity.contains))
          (d.withColumn(name, f(inputs.map(i => col(byQuantity(i))))),
            acc :+ VariableMeta(name, derivedUnits(name), "Avg"))
        else (d, acc)
    }
    L1Pipeline.Conditioned(df,
      c.meta.copy(variables = c.meta.variables ++ added))
  }

  private def derivedUnits(name: String): String = name match {
    case "VPD" => "kPa"
    case "AH" => "g/m^3"
    case "RH" => "percent"
    case "Td" => "degC"
    case _ => ""
  }

  /** Full E2 chain ending in a TOA5 extract on disk. */
  def buildVisualisationToa5(c: L1Pipeline.Conditioned, tsCol: String,
      targets: Seq[String], fluxHeight: Double,
      plausible: Map[String, (Double, Double)], outPath: String): Unit = {
    val selected = selectVariables(c, targets, fluxHeight)
    val renamed = normalise(selected)
    // P5 masking keyed by quantity (plausible bounds come from the
    // standard-names catalog, columns carry site-specific names).
    val masked = VariableCatalog.parse(renamed.meta.variables)
      .foldLeft(renamed.df) { (d, e) =>
        plausible.get(e.parsed.quantity) match {
          case Some((lo, hi)) if d.columns.contains(e.name) =>
            d.withColumn(e.name,
              TimeSeriesOps.maskRange(col(e.name), lo, hi))
          case _ => d
        }
      }
    val derived = deriveMissing(renamed.copy(df = masked))
    graft.sources.Toa5.write(derived.df, withTimestampVar(derived.meta),
      outPath, tsCol)
  }

  private def withTimestampVar(meta: TableMeta): TableMeta =
    if (meta.variableNames.contains("TIMESTAMP")) meta
    else meta.copy(variables =
      VariableMeta("TIMESTAMP", "TS", "") +: meta.variables)
}
