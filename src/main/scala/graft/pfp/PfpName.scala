package graft.pfp

/** PFP controlled-vocabulary variable-name grammar.
  *
  * Re-expresses the reference's name micro-grammar (parser at
  * code/managers/metadata.py:946-1284): a variable name is
  *
  *   quantity [_instrument] [_system] [_vloc[hloc][rep]] [_process]
  *
  * where system is a flux-system suffix (EP/EF/DL), vloc is a height/
  * depth like `2m`, `30cm` or a range `0-30cm`, hloc a single letter,
  * rep a digit, and process a statistic suffix (Av/Sd/Vr/Ct/Tot/Smp)
  * or QCFlag. Pure Scala (driver-side catalog work); usable in tests.
  */
object PfpName {

  /** Typed parse-error taxonomy mirroring the reference's per-check
    * error classes (metadata.py:1072-1283): each failed check raises
    * its own message; an unconsumed element surfaces as
    * [[UnrecognisedElement]] like the reference's final RuntimeError
    * (metadata.py:1049-1054). */
  sealed trait PfpError { def message: String }
  case object EmptyName extends PfpError {
    val message = "empty name" }
  final case class EmptyComponent(name: String) extends PfpError {
    def message = s"empty component in $name" }
  final case class InvalidQuantity(quantity: String) extends PfpError {
    def message = s"$quantity is not a valid quantity identifier!" }
  final case class DuplicateComponent(kind: String, name: String)
      extends PfpError {
    def message = s"duplicate $kind in $name" }
  final case class TooManyHeightIdentifiers(token: String)
      extends PfpError {
    def message = "A maximum of two height / depth identifiers is " +
      s"allowed! Passed substring \"$token\" does not conform!" }
  final case class NonNumericHeight(token: String) extends PfpError {
    def message = "Characters preceding height / depth units must be " +
      "numeric, or contain numerals separated by single \"-\"! " +
      s"Passed substring \"$token\" does not conform!" }
  final case class NonAlphaHorizontal(token: String) extends PfpError {
    def message = s"$token is not an alpha character!" }
  final case class NonIntegerReplicate(token: String) extends PfpError {
    def message = "Replicate number must be an integer!" }
  final case class UnrecognisedElement(token: String, name: String)
      extends PfpError {
    def message = s"Unrecognised element remains: checks failed for " +
      s"variable name $name with element '$token'" }

  final case class Parsed(
      quantity: String,
      instrument: Option[String] = None,
      system: Option[String] = None,
      verticalLocation: Option[String] = None,
      horizontalLocation: Option[String] = None,
      replicate: Option[Int] = None,
      process: Option[String] = None) {

    /** Depth/height in metres (ranges -> midpoint), negative for cm
      * depths is NOT applied — sign conventions live in the catalog. */
    def heightMetres: Option[Double] =
      verticalLocation.flatMap(parseHeightMetres)

    def render: String = {
      val loc = verticalLocation.getOrElse("") +
        horizontalLocation.getOrElse("") +
        replicate.map(_.toString).getOrElse("")
      (Seq(quantity) ++ instrument ++ system ++
        (if (loc.nonEmpty) Seq(loc) else Nil) ++ process).mkString("_")
    }
  }

  val ProcessTokens = Set("Av", "Sd", "Vr", "Ct", "Tot", "Smp", "QCFlag")
  val SystemTokens = Set("EP", "EF", "DL")

  private val LocRe =
    """^(\d+(?:\.\d+)?(?:-\d+(?:\.\d+)?)?)(cm|m)([a-zA-Z])?(\d)?$""".r

  /** The reference toolchain's cm->m rename rstrips trailing zeros but
    * leaves the decimal point on whole-metre values
    * (convert_calc_filter.py:417-465 fencepost), emitting `Sws_1.m_Av`.
    * Accept that `N.m` form on input by dropping a dangling dot before
    * a unit or range separator (`1.m` -> `1m`, `0.-1.m` -> `0-1m`);
    * [[Parsed.render]] always emits the clean form. */
  private def normalizeLoc(tok: String): String =
    tok.replaceAll("""(\d)\.(?=-|cm|m)""", "$1")

  /** [[LocRe]] over the [[normalizeLoc]]-canonicalised token, so the
    * stored verticalLocation is always the clean form. */
  private object NormLoc {
    def unapply(tok: String): Option[(String, String, String, String)] =
      normalizeLoc(tok) match {
        case LocRe(v, unit, h, r) => Some((v, unit, h, r))
        case _ => None
      }
  }

  /** Parse a variable name; Left(typed error) on grammar violations.
    * `validQuantities`, when non-empty, enforces the reference's
    * vocabulary membership check (metadata.py:1098-1101). */
  def parse(name: String, validQuantities: Set[String] = Set.empty)
      : Either[PfpError, Parsed] = {
    if (name == null || name.isEmpty) return Left(EmptyName)
    val parts = name.split("_", -1).toList
    if (parts.exists(_.isEmpty)) return Left(EmptyComponent(name))

    val quantity = parts.head
    if (!quantity.head.isLetter) return Left(InvalidQuantity(quantity))
    if (validQuantities.nonEmpty && !validQuantities.contains(quantity))
      return Left(InvalidQuantity(quantity))

    var rest = parts.tail
    var p = Parsed(quantity)

    // trailing process token
    rest.lastOption.filter(ProcessTokens.contains).foreach { proc =>
      p = p.copy(process = Some(proc)); rest = rest.init
    }
    rest.foreach { tok =>
      tok match {
        case t if SystemTokens.contains(t) =>
          if (p.system.isDefined)
            return Left(DuplicateComponent("system", name))
          p = p.copy(system = Some(t))
        case NormLoc(v, unit, h, r) =>
          if (p.verticalLocation.isDefined)
            return Left(DuplicateComponent("location", name))
          p = p.copy(
            verticalLocation = Some(v + unit),
            horizontalLocation = Option(h),
            replicate = Option(r).map(_.toInt))
        case t if t.head.isLetter && p.instrument.isEmpty
            && p.verticalLocation.isEmpty =>
          // instrument slot — digit-leading tokens are never
          // instruments (they're malformed locations; classify below)
          p = p.copy(instrument = Some(t))
        case t => return Left(classifyBadToken(t, name))
      }
    }
    Right(p)
  }

  /** Map a token that failed every check onto the reference's error
    * class for it (the per-check TypeError messages of
    * metadata.py:1163-1283). */
  private def classifyBadToken(tok: String, name: String): PfpError = {
    val unitIdx = Seq("cm", "m").iterator
      .map(u => (u, tok.indexOf(u))).find(_._2 > 0)
    unitIdx match {
      case Some((u, i)) =>
        val pre = tok.substring(0, i)
        val pieces = pre.split("-", -1)
        if (pieces.length > 2) TooManyHeightIdentifiers(tok)
        else if (!pieces.forall(_.toDoubleOption.isDefined))
          NonNumericHeight(tok)
        else {
          // numerals + units parsed, so the residue after the units is
          // the bad part: a non-alpha horizontal or non-digit replicate
          val residue = tok.substring(i + u.length)
          if (residue.nonEmpty && !residue.head.isLetter)
            NonAlphaHorizontal(residue.head.toString)
          else if (residue.length > 1 && !residue.tail.forall(_.isDigit))
            NonIntegerReplicate(residue.tail)
          else UnrecognisedElement(tok, name)
        }
      case None => UnrecognisedElement(tok, name)
    }
  }

  /** F29: vertical-location string -> metres; ranges use the midpoint
    * (reference: convert_calc_filter.py:417-465). */
  def parseHeightMetres(loc: String): Option[Double] = loc match {
    case s if s.endsWith("cm") => midpoint(s.dropRight(2)).map(_ / 100.0)
    case s if s.endsWith("m") => midpoint(s.dropRight(1))
    case _ => None
  }

  private def midpoint(s: String): Option[Double] =
    s.split("-") match {
      case Array(a) => a.toDoubleOption
      case Array(a, b) =>
        for (x <- a.toDoubleOption; y <- b.toDoubleOption)
          yield (x + y) / 2.0
      case _ => None
    }

  // --- process-suffix attribute rewrites ------------------------------
  // (reference: metadata.py:1299-1364 + the Vr/Ct/QC dispatch at
  // metadata.py:1057-1065 and _amend_variance_metadata at :676-690)

  /** Standard units <-> variance units (convert_variance_units). An
    * unknown unit throws, like the reference's KeyError. */
  private val VarianceUnits = Map(
    "g/m^3" -> "g^2/m^6",
    "umol/mol" -> "umol/mol",
    "mg/m^3" -> "mg^2/m^6",
    "degC" -> "degC^2",
    "m/s" -> "m^2/s^2",
    "mmol/m^3" -> "mmol^2/m^6",
    "mmol/mol" -> "mmol/mol")

  def convertVarianceUnits(units: String, toVariance: Boolean = true)
      : String = {
    val m = if (toVariance) VarianceUnits
      else VarianceUnits.map(_.swap)
    m.getOrElse(units, throw new NoSuchElementException(
      s"no variance-units mapping for '$units'"))
  }

  import graft.core.VariableMeta

  /** Apply the process-suffix metadata rewrite for a variable whose
    * base (quantity-level) attrs are `meta`:
    *
    *  - `Vr`: units become variance units (metadata.py:1057-1061);
    *  - `Ct`: units `1`, long name "Number of samples of ...",
    *    plausible [0, inf), standard name dropped (edit_count_info);
    *  - `QCFlag`: units `1`, long name "QC flag value of ...",
    *    plausible [0, inf), standard name dropped (edit_QC_info).
    *
    * Other suffixes pass through unchanged. */
  def rewriteProcessAttrs(meta: VariableMeta, process: Option[String])
      : VariableMeta = process match {
    case Some("Vr") =>
      meta.copy(units = convertVarianceUnits(meta.units))
    case Some("Ct") =>
      meta.copy(units = "1",
        longName = meta.longName.map("Number of samples of " + _),
        standardName = None,
        plausibleMin = Some(0.0), plausibleMax = None)
    case Some("QCFlag") =>
      meta.copy(units = "1",
        longName = meta.longName.map("QC flag value of " + _),
        standardName = None,
        plausibleMin = Some(0.0), plausibleMax = None)
    case _ => meta
  }

  /** The L1 Vr -> Sd amendment (SURVEY §7.4#9; _amend_variance_metadata,
    * metadata.py:676-690): a variance variable renamed to standard
    * deviation gets its name's `Vr` suffix replaced with `Sd`, its
    * VARIANCE units converted back to standard units, and its
    * sampling/statistic field set to `Sd`. Non-Vr variables pass
    * through unchanged. */
  def varianceToStdev(meta: VariableMeta): VariableMeta =
    parse(meta.name) match {
      case Right(p) if p.process.contains("Vr") =>
        meta.copy(
          name = p.copy(process = Some("Sd")).render,
          units = convertVarianceUnits(meta.units, toVariance = false),
          sampling = "Sd")
      case _ => meta
    }

  /** F29 rename: soil-depth cm -> m in a variable name, e.g.
    * `Sws_30cm_Av` -> `Sws_0.3m_Av`, ranges to midpoints. */
  def depthCmToM(name: String): String =
    parse(name).toOption.flatMap { p =>
      p.verticalLocation.filter(_.endsWith("cm")).flatMap { v =>
        parseHeightMetres(v).map { m =>
          val rendered = if (m == m.floor) s"${m.toLong}m" else s"${m}m"
          p.copy(verticalLocation = Some(rendered)).render
        }
      }
    }.getOrElse(name)
}
