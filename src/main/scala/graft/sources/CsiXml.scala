package graft.sources

import java.io.ByteArrayInputStream
import javax.xml.parsers.DocumentBuilderFactory

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{FileInfo, TableMeta, VariableMeta}

/** S10: CSIXML source — Campbell's XML data format: a <head> with
  * environment + per-field metadata, and a <data> section of <r>
  * records carrying time/record-no attributes and per-field <v>
  * values (reference behavior:
  * code/file_handling/read_cs_files.py:204-243,152-174).
  *
  * Files are small (logger pulls); decode uses the JDK DOM parser in
  * executors via the binaryFile source — one file per task, no
  * external XML dependency.
  */
object CsiXml {

  final case class Parsed(data: DataFrame, meta: TableMeta)

  private def parseDoc(bytes: Array[Byte]) = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    // hardening: no external entities (untrusted logger input)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def childElems(n: org.w3c.dom.Node): Seq[org.w3c.dom.Element] = {
    val nl = n.getChildNodes
    (0 until nl.getLength).map(nl.item)
      .collect { case e: org.w3c.dom.Element => e }
  }

  /** Driver-side header probe: field names/types from <head>. */
  def probeMeta(bytes: Array[Byte]): TableMeta = {
    val doc = parseDoc(bytes)
    val root = doc.getDocumentElement
    val head = childElems(root).find(_.getTagName == "head").get
    val fields = childElems(head).find(_.getTagName == "fields").get
    val vars = childElems(fields).map { f =>
      VariableMeta(
        name = f.getAttribute("name"),
        units = Option(f.getAttribute("units")).getOrElse(""),
        sampling = Option(f.getAttribute("process")).getOrElse(""))
    }
    val env = childElems(head).find(_.getTagName == "environment")
    def envVal(tag: String): String = env.flatMap(e =>
      childElems(e).find(_.getTagName == tag).map(_.getTextContent))
      .getOrElse("")
    TableMeta(
      FileInfo("CSIXML", envVal("station-name"), envVal("model"),
        envVal("serial-no"), envVal("os-version"), envVal("dld-name"),
        "", envVal("table-name")),
      VariableMeta("TIMESTAMP", "TS", "") +:
        VariableMeta("RECORD", "RN", "") +: vars)
  }

  /** Decode one file: (time attr, record no, field values as double). */
  def decode(bytes: Array[Byte], nFields: Int): Seq[Row] = {
    val doc = parseDoc(bytes)
    val root = doc.getDocumentElement
    val data = childElems(root).find(_.getTagName == "data").get
    childElems(data).filter(_.getTagName == "r").map { r =>
      val time = r.getAttribute("time")     // ISO "2024-01-01T00:30:00"
      val no = r.getAttribute("no").toLong
      val vals: Seq[Any] = childElems(r).filter(_.getTagName == "v")
        .map(v => v.getTextContent.toDoubleOption
          .map(java.lang.Double.valueOf).orNull)
        .padTo(nFields, null)
      Row.fromSeq(time +: no +: vals.take(nFields))
    }
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case '"' => "&quot;"; case c => c.toString
    }

  /** CSIXML writer — emits the head/environment/fields + data/r/v
    * document shape the reader (and the reference's
    * read_cs_files.py:204-243) consumes: ISO `%Y-%m-%dT%H:%M:%S` time
    * attribute, integer record-no attribute, one <v> element per field
    * (empty element for null). Doubles render shortest-repr, so a
    * write-then-read roundtrip is value-exact. Driver-side by design:
    * CSIXML files are small logger pulls, like the TOA5 single-file
    * writer. `rows` are (timestamp, record-no, field values in meta
    * order after TIMESTAMP/RECORD). */
  def write(path: String, meta: TableMeta,
      rows: Seq[(java.time.LocalDateTime, Long, Seq[Any])]): Unit = {
    val valueVars = meta.variables
      .filterNot(v => v.name == "TIMESTAMP" || v.name == "RECORD")
    val tFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
    val i = meta.info
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" standalone=\"yes\"?>\n")
    sb.append("<csixml version=\"1.0\">\n <head>\n  <environment>\n")
    Seq("station-name" -> i.stationName, "table-name" -> i.tableName,
        "model" -> i.loggerType, "serial-no" -> i.serialNum,
        "os-version" -> i.osVersion, "dld-name" -> i.programName)
      .foreach { case (tag, v) =>
        sb.append(s"   <$tag>${xmlEscape(v)}</$tag>\n") }
    sb.append("  </environment>\n  <fields>\n")
    valueVars.foreach { v =>
      sb.append("   <field name=\"").append(xmlEscape(v.name))
        .append("\" type=\"xsd:double\" units=\"").append(xmlEscape(v.units))
        .append("\" process=\"").append(xmlEscape(v.sampling))
        .append("\"/>\n")
    }
    sb.append("  </fields>\n </head>\n <data>\n")
    rows.foreach { case (ts, no, vals) =>
      sb.append("  <r time=\"").append(ts.format(tFmt))
        .append("\" no=\"").append(no).append("\">")
      vals.foreach {
        case null => sb.append("<v/>")
        case v    => sb.append("<v>").append(v.toString).append("</v>")
      }
      sb.append("</r>\n")
    }
    sb.append(" </data>\n</csixml>\n")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def read(spark: SparkSession, path: String): Parsed = {
    val bin = spark.read.format("binaryFile").load(path)
      .select("content")
    val meta = probeMeta(bin.head().getAs[Array[Byte]](0))
    val valueVars = meta.variables.drop(2)
    val decodeSchema = StructType(
      StructField("time_str", StringType) ::
      StructField("RECORD", LongType) ::
      valueVars.map(v => StructField(v.name, DoubleType)).toList)
    implicit val enc: Encoder[Row] = Encoders.row(decodeSchema)
    val n = valueVars.length
    val rows = bin.flatMap(r => decode(r.getAs[Array[Byte]](0), n))
    val df = rows
      .withColumn("DATETIME",
        try_to_timestamp(col("time_str"),
          lit("yyyy-MM-dd'T'HH:mm:ss")))
      .drop("time_str")
      .select(col("DATETIME") +: col("RECORD") +:
        valueVars.map(v => col(v.name)): _*)
      .filter(col("DATETIME").isNotNull)
    Parsed(df, meta)
  }
}
