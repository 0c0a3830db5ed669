package graft.rtmc

/** RTMC calculation-string generator (reference:
  * code/rtmc_xml/rtmc_xml_parser.py:627-1013, RtmcSyntaxGenerator).
  * RTMC dashboards evaluate a tiny expression language over aliased
  * logger columns; building a site dashboard means synthesizing alias
  * blocks plus arithmetic over them for derived quantities (net
  * radiation, energy-balance residual, soil heat storage, ...).
  * Pure string building — deterministic, driver-side, no Spark.
  *
  * Results carry the reference's three-part structure (optional start
  * condition, alias block, eval expression) joined with blank
  * CRLF-separated lines in [[RtmcSyntax.Calc.asString]].
  */
object RtmcSyntax {

  /** A calculation in parts: optional start condition, the Alias()
    * block, and the expression evaluated over the aliases. */
  final case class Calc(startCond: Option[String], aliasString: String,
      evalString: String) {
    def asString: String =
      (startCond.toSeq ++ Seq(aliasString, evalString))
        .mkString("\r\n\r\n")
  }

  /** Start-condition strings (the `{}` is literal — the reference
    * never interpolates it; rtmc_xml_parser.py:634-657). */
  private val StartConds = Map(
    "start" -> "StartRelativeToNewest({},OrderCollected);",
    "start_absolute" -> "StartAtRecord(0,0,OrderCollected);")

  private def startCondFor(name: Option[String]): Option[String] =
    name.map(n => StartConds.getOrElse(n,
      throw new NoSuchElementException(s"unknown start condition $n")))

  private def stripped(v: String): String = v.replace("-", "_")

  /** Alias block: one `Alias(name,"DataFile:merged.column");` per
    * variable, CRLF-joined; dashes in the alias name become
    * underscores while the source column keeps them
    * (rtmc_xml_parser.py:709-740). */
  def aliasString(varList: Seq[String]): String =
    varList.map(v =>
      s"""Alias(${stripped(v)},"DataFile:merged.$v");""")
      .mkString("\r\n")

  /** No-data alarm source string (rtmc_xml_parser.py:742-746). */
  def noDataStatusString(loggerName: String, tableName: String): String =
    s""""LinuxServer:$loggerName.$tableName""""

  /** Comm-status alarm expression (rtmc_xml_parser.py:748-768); the
    * trailing space is the reference's. */
  def commStatusString(loggerName: String): String =
    s""""Server:__statistics__.${loggerName}_std.Collection State" > 2 """

  /** Scale an expression to its running range
    * (rtmc_xml_parser.py:685-707). */
  def scaledToRange(evalString: String): String =
    s"($evalString - MinRun($evalString)) / " +
      s"(MaxRun($evalString) - MinRun($evalString))"

  /** Daily-reset cumulative total of an expression
    * (rtmc_xml_parser.py:661-683). */
  def cumulativeTotal(evalString: String, timestampVar: String,
      scalingStr: String = ""): String =
    Seq("TotalOverTimeWithReset(", "(", evalString, s")$scalingStr,",
      s"Timestamp($timestampVar),", "RESET_DAILY", ")").mkString("\n")

  /** Aliased output of one or more variables: multiple variables are
    * spatially averaged (AvgSpa); scaling to range forces an absolute
    * start condition (rtmc_xml_parser.py:770-790). */
  def aliasedOutput(varList: Seq[String],
      startCond: Option[String] = None,
      scaledToRangeFlag: Boolean = false): Calc = {
    val alias = aliasString(varList)
    val joined = varList.map(stripped).mkString(",")
    val base = if (varList.length > 1) s"AvgSpa($joined)" else joined
    val (eval, cond) =
      if (scaledToRangeFlag) (scaledToRange(base), Some("start_absolute"))
      else (base, startCond)
    Calc(startCondFor(cond), alias, eval)
  }

  /** Net radiation Fsd-Fsu+Fld-Flu; cumulative form integrates to
    * MJ/m2 with the reference's half-hour scaling
    * (rtmc_xml_parser.py:792-814). */
  def netRadiation(cuml: Boolean = false): Calc = {
    val alias = Seq("Fsd", "Fsu", "Fld", "Flu")
      .map(v => aliasedOutput(Seq(v)).aliasString).mkString("\r\n")
    val eval = "Fsd-Fsu+Fld-Flu"
    Calc(None, alias,
      if (cuml) cumulativeTotal(eval, "Fsd", "*1800/10^6") else eval)
  }

  /** Net turbulent energy Fh+Fe (rtmc_xml_parser.py:817-832). */
  def netTurbulentEnergy: Calc = {
    val alias = Seq("Fh", "Fe")
      .map(v => aliasedOutput(Seq(v)).aliasString).mkString("\r\n")
    Calc(None, alias, "Fh+Fe")
  }

  /** Soil heat flux = spatial average of the plate variables
    * (rtmc_xml_parser.py:1000-1008). */
  def soilHeatFlux(soilHFList: Seq[String]): Calc =
    aliasedOutput(soilHFList)

  /** Soil heat storage above the plates from the rate of change of
    * (spatially averaged) soil temperature
    * (rtmc_xml_parser.py:939-967). */
  def soilHeatStorage(soilTList: Seq[String], cp: Int = 1800,
      seconds: Int = 1800, layerDepth: Double = 0.08,
      startCond: Option[String] = None): Calc = {
    val avg = aliasedOutput(soilTList)
    val alias = Seq(avg.aliasString, s"Alias(Cp,$cp);").mkString("\r\n")
    val eval = Seq("Cp*(", s"${avg.evalString}-",
      s"Last(${avg.evalString})", s")/($seconds*$layerDepth)")
      .mkString("\n")
    Calc(startCondFor(startCond), alias, eval)
  }

  /** Storage-corrected soil heat flux = plate flux + storage
    * (rtmc_xml_parser.py:969-997). */
  def correctedSoilHeatFlux(soilHFList: Seq[String],
      soilTList: Seq[String], cp: Int = 1800, seconds: Int = 1800,
      layerDepth: Double = 0.08): Calc = {
    val stor = soilHeatStorage(soilTList, cp, seconds, layerDepth)
    val flux = soilHeatFlux(soilHFList)
    Calc(None,
      Seq(flux.aliasString, stor.aliasString).mkString("\r\n"),
      Seq(s"${flux.evalString}+", stor.evalString).mkString("\n"))
  }

  /** Net non-radiant energy: turbulent flux plus (corrected) soil
    * flux (rtmc_xml_parser.py:834-876). */
  def netNonRadiantEnergy(soilHFList: Seq[String],
      soilTList: Option[Seq[String]] = None,
      cuml: Boolean = false): Calc = {
    val turb = netTurbulentEnergy
    val soil = soilTList match {
      case Some(ts) => correctedSoilHeatFlux(soilHFList, ts)
      case None     => aliasedOutput(soilHFList)
    }
    val eval = Seq(s"${turb.evalString}+", "(", soil.evalString, ")")
      .mkString("\n")
    Calc(None,
      Seq(turb.aliasString, soil.aliasString).mkString("\r\n"),
      if (cuml) cumulativeTotal(eval, "Fh", "*1800/10^6") else eval)
  }

  /** Energy-balance residual: net radiation minus non-radiant energy
    * (rtmc_xml_parser.py:878-904). */
  def energyBalanceResidual(soilHFList: Seq[String],
      soilTList: Option[Seq[String]] = None): Calc = {
    val rad = netRadiation()
    val non = netNonRadiantEnergy(soilHFList, soilTList)
    Calc(None,
      Seq(rad.aliasString, non.aliasString).mkString("\r\n"),
      Seq(s"${rad.evalString}-", "(", non.evalString, ")")
        .mkString("\n"))
  }

  /** Available energy: net radiation minus (corrected) soil flux
    * (rtmc_xml_parser.py:906-937). */
  def availableEnergy(soilHFList: Seq[String],
      soilTList: Option[Seq[String]] = None): Calc = {
    val rad = netRadiation()
    val soil = soilTList match {
      case Some(ts) => correctedSoilHeatFlux(soilHFList, ts)
      case None     => soilHeatFlux(soilHFList)
    }
    Calc(None,
      Seq(rad.aliasString, soil.aliasString).mkString("\r\n"),
      Seq(s"(${rad.evalString})-", "(", soil.evalString, ")")
        .mkString("\n"))
  }
}
