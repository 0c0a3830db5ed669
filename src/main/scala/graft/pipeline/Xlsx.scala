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
