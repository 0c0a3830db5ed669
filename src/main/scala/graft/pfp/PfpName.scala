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

  /** Parse a variable name; Left(reason) on grammar violations. */
  def parse(name: String): Either[String, Parsed] = {
    if (name == null || name.isEmpty) return Left("empty name")
    val parts = name.split("_", -1).toList
    if (parts.exists(_.isEmpty)) return Left(s"empty component in $name")

    val quantity = parts.head
    if (!quantity.head.isLetter) return Left(s"bad quantity: $quantity")

    var rest = parts.tail
    var p = Parsed(quantity)

    // trailing process token
    rest.lastOption.filter(ProcessTokens.contains).foreach { proc =>
      p = p.copy(process = Some(proc)); rest = rest.init
    }
    rest.foreach { tok =>
      tok match {
        case t if SystemTokens.contains(t) =>
          if (p.system.isDefined) return Left(s"duplicate system in $name")
          p = p.copy(system = Some(t))
        case LocRe(v, unit, h, r) =>
          if (p.verticalLocation.isDefined)
            return Left(s"duplicate location in $name")
          p = p.copy(
            verticalLocation = Some(v + unit),
            horizontalLocation = Option(h),
            replicate = Option(r).map(_.toInt))
        case t if p.instrument.isEmpty && p.verticalLocation.isEmpty =>
          p = p.copy(instrument = Some(t))
        case t => return Left(s"unparseable component '$t' in $name")
      }
    }
    Right(p)
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
