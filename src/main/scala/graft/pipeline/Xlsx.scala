package graft.pipeline

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal xlsx (OOXML spreadsheet) writer — no external library.
  *
  * An .xlsx file is a zip of XML parts; this emits the minimal
  * conforming set ([Content_Types].xml, _rels, workbook, styles, one
  * worksheet part per sheet) with inline strings (no shared-string
  * table) and solid-fill cell styles — everything the K6 status
  * workbook needs (reference: code/network_monitoring/
  * network_status.py:634-884). Driver-side by design: status
  * workbooks are tiny presentation artifacts.
  */
object Xlsx {

  /** `fill` indexes [[write]]'s fillColors (0 = unstyled). */
  final case class Cell(value: Any, fill: Int = 0)
  final case class Sheet(name: String, rows: Seq[Seq[Cell]],
      colWidths: Seq[Int] = Nil)

  private def xmlEsc(s: String): String = s.flatMap {
    case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
    case '"' => "&quot;"; case '\'' => "&apos;"
    case c => c.toString
  }

  /** A, B, .., Z, AA, AB ... for 0-based column index. */
  private[graft] def colLetter(i: Int): String = {
    var n = i; val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  private def cellXml(rowIdx: Int, colIdx: Int, c: Cell): String = {
    val ref = s"${colLetter(colIdx)}${rowIdx + 1}"
    val s = if (c.fill > 0) s""" s="${c.fill}"""" else ""
    c.value match {
      case null => ""
      // non-finite doubles have no valid xlsx numeric form — emit a
      // valueless (blank) cell, keeping any style, like pandas does
      case n: java.lang.Double if n.isNaN || n.isInfinite =>
        s"""<c r="$ref"$s/>"""
      case n: java.lang.Float if n.isNaN || n.isInfinite =>
        s"""<c r="$ref"$s/>"""
      case n: Number =>
        s"""<c r="$ref"$s><v>$n</v></c>"""
      case b: Boolean =>
        s"""<c r="$ref"$s t="b"><v>${if (b) 1 else 0}</v></c>"""
      case other =>
        s"""<c r="$ref"$s t="inlineStr"><is><t xml:space="preserve">${
          xmlEsc(other.toString)}</t></is></c>"""
    }
  }

  private def sheetXml(sheet: Sheet): String = {
    val cols =
      if (sheet.colWidths.isEmpty) ""
      else sheet.colWidths.zipWithIndex.map { case (w, i) =>
        s"""<col min="${i + 1}" max="${i + 1}" width="$w" customWidth="1"/>"""
      }.mkString("<cols>", "", "</cols>")
    val rows = sheet.rows.zipWithIndex.map { case (r, i) =>
      val cells = r.zipWithIndex.map { case (c, j) => cellXml(i, j, c) }
      s"""<row r="${i + 1}">${cells.mkString}</row>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">$cols<sheetData>$rows</sheetData></worksheet>"""
  }

  private def stylesXml(fillColors: Seq[String]): String = {
    // fills 0 (none) and 1 (gray125) are mandated by the spec; user
    // colors start at fill id 2. cellXfs index k styles user color k-1
    // so Cell(fill = k) refers to fillColors(k - 1).
    val fills = fillColors.map(c =>
      s"""<fill><patternFill patternType="solid"><fgColor rgb="$c"/><bgColor indexed="64"/></patternFill></fill>""").mkString
    val xfs = fillColors.indices.map(i =>
      s"""<xf numFmtId="0" fontId="0" fillId="${i + 2}" borderId="0" xfId="0" applyFill="1"/>""").mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="${fillColors.length + 2}"><fill><patternFill patternType="none"/></fill><fill><patternFill patternType="gray125"/></fill>$fills</fills>
<borders count="1"><border><left/><right/><top/><bottom/><diagonal/></border></borders>
<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>
<cellXfs count="${fillColors.length + 1}"><xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>$xfs</cellXfs>
</styleSheet>"""
  }

  // --- reader (S12: read_excel passthrough, file_io.py:421-446) ------

  private def colIndexOf(ref: String): Int = {
    var i = 0; var n = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      n = n * 26 + (ref.charAt(i) - 'A' + 1); i += 1
    }
    n - 1
  }

  private def textOf(n: org.w3c.dom.Node): String = {
    val sb = new StringBuilder
    val kids = n.getChildNodes
    (0 until kids.getLength).foreach { i =>
      val k = kids.item(i)
      if (k.getNodeName == "t") sb.append(k.getTextContent)
      else if (k.hasChildNodes) sb.append(textOf(k))
    }
    sb.toString
  }

  /** Read one sheet of an xlsx workbook: rows of raw cell values
    * (Double for numeric, String for shared/inline strings, Boolean),
    * None for absent cells. Supports shared strings AND inline
    * strings, so both external workbooks and [[write]] output parse.
    * Driver-side: config workbooks are tiny. */
  def readRaw(path: String, sheetName: String): Seq[Seq[Option[Any]]] = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      val db = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      db.setNamespaceAware(false)
      def parse(name: String): org.w3c.dom.Document = {
        val e = zf.getEntry(name)
        require(e != null, s"missing workbook part $name in $path")
        val in = zf.getInputStream(e)
        try db.newDocumentBuilder().parse(in) finally in.close()
      }
      // sheet name -> rId -> worksheet part
      val wb = parse("xl/workbook.xml")
      val sheets = wb.getElementsByTagName("sheet")
      val rid = (0 until sheets.getLength).map(sheets.item(_))
        .collectFirst {
          case s if s.getAttributes.getNamedItem("name")
              .getNodeValue == sheetName =>
            s.getAttributes.getNamedItem("r:id").getNodeValue
        }.getOrElse(throw new NoSuchElementException(
          s"no sheet '$sheetName' in $path"))
      val rels = parse("xl/_rels/workbook.xml.rels")
      val relNodes = rels.getElementsByTagName("Relationship")
      val target = (0 until relNodes.getLength).map(relNodes.item(_))
        .collectFirst {
          case r if r.getAttributes.getNamedItem("Id")
              .getNodeValue == rid =>
            r.getAttributes.getNamedItem("Target").getNodeValue
        }.get
      val shared: IndexedSeq[String] =
        if (zf.getEntry("xl/sharedStrings.xml") == null) IndexedSeq.empty
        else {
          val ss = parse("xl/sharedStrings.xml")
          val sis = ss.getElementsByTagName("si")
          (0 until sis.getLength).map(i => textOf(sis.item(i)))
        }
      val ws = parse(s"xl/${target.stripPrefix("/xl/").stripPrefix("xl/")}")
      val rowNodes = ws.getElementsByTagName("row")
      // honor each row's r attribute: writers omit empty rows, and
      // positional indexing would silently shift later rows up. A row
      // WITHOUT r is implied to follow the previous row (OOXML rule),
      // not to sit at its DOM position.
      var lastIdx = -1
      val indexed = (0 until rowNodes.getLength).map { ri =>
        val row = rowNodes.item(ri)
        val idx = Option(row.getAttributes.getNamedItem("r"))
          .map(_.getNodeValue.toInt - 1).getOrElse(lastIdx + 1)
        lastIdx = idx
        idx -> row
      }
      val byRowIdx = indexed.toMap
      require(byRowIdx.size == indexed.size,
        s"duplicate row indices in sheet '$sheetName' of $path")
      val maxRow = if (byRowIdx.isEmpty) -1 else byRowIdx.keys.max
      // gap rows materialize as empty — bound the dense fill so one
      // stray far-away cell can't balloon into millions of rows
      require(maxRow < 200000,
        s"sheet '$sheetName' of $path spans ${maxRow + 1} rows — too " +
        "large/sparse for the config-workbook reader")
      (0 to maxRow).map { ri =>
        byRowIdx.get(ri) match {
          case None => IndexedSeq.empty
          case Some(row) => readRow(row, shared)
        }
      }
    } finally zf.close()
  }

  private def readRow(row: org.w3c.dom.Node,
      shared: IndexedSeq[String]): IndexedSeq[Option[Any]] = {
    val cells = row.getChildNodes
    val byCol = scala.collection.mutable.Map[Int, Any]()
    (0 until cells.getLength).foreach { ci =>
      val c = cells.item(ci)
      if (c.getNodeName == "c") {
        val attrs = c.getAttributes
        val ref = Option(attrs.getNamedItem("r")).map(_.getNodeValue)
        val colIdx = ref.map(colIndexOf).getOrElse(byCol.size)
        val t = Option(attrs.getNamedItem("t")).map(_.getNodeValue)
          .getOrElse("n")
        def v: Option[String] = {
          val kids = c.getChildNodes
          (0 until kids.getLength).map(kids.item(_))
            .find(_.getNodeName == "v").map(_.getTextContent)
        }
        val value: Option[Any] = t match {
          case "inlineStr" => Some(textOf(c))
          case "s" => v.map(i => shared(i.toInt))
          case "str" => v
          case "b" => v.map(_ == "1")
          case _ => v.map(_.toDouble)
        }
        value.foreach(byCol(colIdx) = _)
      }
    }
    if (byCol.isEmpty) IndexedSeq.empty
    else (0 to byCol.keys.max).map(byCol.get)
  }

  /** read_excel equivalent: sheet -> DataFrame with the given header
    * row (0-based), optional `usecols` projection. Column type is
    * double when every present value is numeric, else string. */
  def readSheet(spark: org.apache.spark.sql.SparkSession, path: String,
      sheetName: String, usecols: Seq[String] = Nil,
      headerRow: Int = 0): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val raw = readRaw(path, sheetName)
    require(raw.length > headerRow, s"no header row $headerRow in $sheetName")
    val header = raw(headerRow).map(_.map(_.toString).getOrElse(""))
    val body = raw.drop(headerRow + 1)
    val keep = header.zipWithIndex.filter { case (h, _) =>
      usecols.isEmpty || usecols.contains(h) }
    val cols = keep.map(_._1)
    val idxs = keep.map(_._2)
    val numeric = idxs.map { i =>
      val vals = body.flatMap(_.lift(i).flatten)
      vals.nonEmpty && vals.forall(_.isInstanceOf[Double])
    }
    val schema = StructType(cols.zip(numeric).map { case (c, isNum) =>
      StructField(c, if (isNum) DoubleType else StringType)
    }.toSeq)
    val rows = body.map { r =>
      org.apache.spark.sql.Row.fromSeq(idxs.zip(numeric).map {
        case (i, isNum) =>
          r.lift(i).flatten match {
            case None => null
            case Some(d: Double) if isNum => d
            case Some(v) => v.toString
          }
      }.toSeq)
    }
    val list = new java.util.ArrayList[org.apache.spark.sql.Row](rows.size)
    rows.foreach(list.add)
    spark.createDataFrame(list, schema)
  }

  def write(path: String, sheets: Seq[Sheet],
      fillColors: Seq[String]): Unit = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    val names = sheets.map(_.name)
    require(names.distinct == names, s"duplicate sheet names: $names")

    val contentTypes =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
${sheets.indices.map(i => s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString("\n")}
</Types>"""

    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>${sheets.zipWithIndex.map { case (s, i) =>
        s"""<sheet name="${xmlEsc(s.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString}</sheets>
</workbook>"""

    val wbRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
${sheets.indices.map(i => s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString("\n")}
<Relationship Id="rId${sheets.length + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
</Relationships>"""

    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos, StandardCharsets.UTF_8)
    def part(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    part("[Content_Types].xml", contentTypes)
    part("_rels/.rels", rootRels)
    part("xl/workbook.xml", workbook)
    part("xl/_rels/workbook.xml.rels", wbRels)
    part("xl/styles.xml", stylesXml(fillColors))
    sheets.zipWithIndex.foreach { case (s, i) =>
      part(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(s))
    }
    zip.close()
    Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
    Files.write(Paths.get(path), bos.toByteArray)
  }
}
