package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S14: Campbell logger web-API source (reference:
  * code/csi_loggers/logger_functions.py:100-270,494-600).
  *
  * The reference drives logger HTTP endpoints (`?command=dataquery`
  * with date-range / since-time / most-recent modes) and wrangles the
  * JSON payload into a (TIMESTAMP, RECORD, values...) frame. This
  * adapter reproduces the full command-string grammar and payload
  * wrangle behind a [[LoggerHttp.Transport]] seam so the network leg
  * is swappable: [[LoggerHttp.UrlTransport]] does a real GET on a
  * deployment; tests and the zero-egress sandbox use a recorded
  * fixture transport. Payload parsing is Spark-native (`from_json`
  * with an explicit schema), so a fleet-wide poll — one URL per
  * logger — fans out as a Dataset of responses with no driver-side
  * JSON work.
  */
object LoggerHttp {

  /** The network seam: URL in, body out. Implementations must throw
    * on non-200 like the reference's do_request. */
  trait Transport extends Serializable {
    def get(url: String): String
  }

  /** Real HTTP GET (java.net.http, 30 s timeout like the reference). */
  final class UrlTransport extends Transport {
    @transient private lazy val client = java.net.http.HttpClient
      .newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30)).build()
    def get(url: String): String = {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(30)).GET().build()
      val rsp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (rsp.statusCode() != 200)
        throw new java.net.ConnectException(
          s"Request $url failed with status code ${rsp.statusCode()}!")
      rsp.body()
    }
  }

  /** Recorded-fixture transport: exact-URL lookup, throws on a miss
    * (so tests also pin the command-string grammar). */
  final case class FixtureTransport(responses: Map[String, String])
      extends Transport {
    def get(url: String): String =
      responses.getOrElse(url, throw new NoSuchElementException(
        s"no recorded response for $url"))
  }

  val ValidFormats = Seq("html", "json", "toa5", "tob1", "xml")

  /** URL grammar of build_cmd_str (logger_functions.py:510-530). */
  def buildCmdStr(ipAddr: String, cmdSubstr: String,
      outFormat: Option[String] = Some("json"),
      source: Option[String] = None): String = {
    outFormat.foreach(f => require(ValidFormats.contains(f),
      s"out_format must be one of ${ValidFormats.mkString(", ")}"))
    val sourceSyntax = source.map(s => s"$s/").getOrElse("")
    val formatSyntax = outFormat.map(f => s"&format=$f").getOrElse("")
    s"http://$ipAddr/$sourceSyntax?command=$cmdSubstr$formatSyntax"
  }

  /** Query grammar of build_query_str (logger_functions.py:532-541). */
  def buildQueryStr(table: String, mode: String, configStr: String,
      variable: Option[String] = None): String = {
    val variableSyntax = variable.map(v => s".$v").getOrElse("")
    s"dataquery&uri=dl:$table$variableSyntax&mode=$mode$configStr"
  }

  /** Logger timestamp literal: `yyyy-MM-ddTHH:mm:ss`. */
  def toLoggerTime(ts: java.sql.Timestamp): String =
    ts.toLocalDateTime.format(java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss"))

  private val payloadSchema = StructType(Seq(
    StructField("head", StructType(Seq(
      StructField("fields", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("type", StringType),
        StructField("units", StringType),
        StructField("process", StringType),
        StructField("settable", BooleanType)))))))),
    StructField("data", ArrayType(StructType(Seq(
      StructField("time", StringType),
      StructField("no", LongType),
      StructField("vals", ArrayType(DoubleType))))))))

  /** Wrangle one dataquery payload to (TIMESTAMP, RECORD, fields...)
    * — the _wrangle_data shape (logger_functions.py:237-270). The
    * logger emits `T`-separated timestamps with optional fractional
    * seconds (primary + secondary formats of the reference). */
  def toDataFrame(spark: SparkSession, payload: String): DataFrame = {
    import spark.implicits._
    val parsed = Seq(payload).toDF("json")
      .select(from_json(col("json"), payloadSchema).as("r"))
    val names = parsed.select(col("r.head.fields.name")).head()
      .getSeq[String](0)
    val ts = regexp_replace(col("d.time"), "T", " ")
    parsed.select(explode(col("r.data")).as("d"))
      .select(
        coalesce(
          try_to_timestamp(ts, lit("yyyy-MM-dd HH:mm:ss")),
          try_to_timestamp(ts, lit("yyyy-MM-dd HH:mm:ss.SSSSSS")),
          try_to_timestamp(ts, lit("yyyy-MM-dd HH:mm:ss.SSS")))
          .as("TIMESTAMP") +:
        col("d.no").as("RECORD") +:
        names.zipWithIndex.map { case (n, i) =>
          col("d.vals").getItem(i).as(n) }: _*)
  }

  /** get_data_by_date_range (logger_functions.py:135-170). */
  def getDataByDateRange(spark: SparkSession, transport: Transport,
      ipAddr: String, start: java.sql.Timestamp, end: java.sql.Timestamp,
      table: String, variable: Option[String] = None): DataFrame = {
    val cmd = buildQueryStr(table, "date-range",
      s"&p1=${toLoggerTime(start)}&p2=${toLoggerTime(end)}", variable)
    toDataFrame(spark, transport.get(buildCmdStr(ipAddr, cmd)))
  }

  /** get_data_since_date (logger_functions.py:172-204). */
  def getDataSinceDate(spark: SparkSession, transport: Transport,
      ipAddr: String, start: java.sql.Timestamp, table: String,
      variable: Option[String] = None): DataFrame = {
    val cmd = buildQueryStr(table, "since-time",
      s"&p1=${toLoggerTime(start)}", variable)
    toDataFrame(spark, transport.get(buildCmdStr(ipAddr, cmd)))
  }

  /** get_data_n_records_back (logger_functions.py:206-235). */
  def getDataNRecordsBack(spark: SparkSession, transport: Transport,
      ipAddr: String, table: String, recsBack: Int = 1,
      variable: Option[String] = None): DataFrame = {
    val cmd = buildQueryStr(table, "most-recent",
      s"&p1=$recsBack", variable)
    toDataFrame(spark, transport.get(buildCmdStr(ipAddr, cmd)))
  }

  /** clock_check (logger_functions.py:109-122): logger's reported
    * clock time. */
  def clockCheck(spark: SparkSession, transport: Transport,
      ipAddr: String): DataFrame = {
    import spark.implicits._
    val body = transport.get(buildCmdStr(ipAddr, "ClockCheck"))
    val schema = StructType(Seq(StructField("time", StringType)))
    Seq(body).toDF("json")
      .select(from_json(col("json"), schema).as("r"))
      .select(lit(ipAddr).as("ip_addr"),
        coalesce(
          try_to_timestamp(regexp_replace(col("r.time"), "T", " "),
            lit("yyyy-MM-dd HH:mm:ss")),
          try_to_timestamp(regexp_replace(col("r.time"), "T", " "),
            lit("yyyy-MM-dd HH:mm:ss.SSSSSS")))
          .as("reported_ts"))
  }

  /** Fleet poll: one dataquery per logger IP, fanned out as a Spark
    * job (the 100-logger network shape — each task does one GET via
    * the serializable transport and yields its payload; the wrangle
    * runs as one distributed from_json pass). Returns (ip_addr,
    * payload) — pair with [[toDataFrame]] per table schema, or
    * [[clockCheck]]-style projections. */
  def pollFleet(spark: SparkSession, transport: Transport,
      ipAddrs: Seq[String], cmdSubstr: String): DataFrame = {
    import spark.implicits._
    if (ipAddrs.isEmpty)
      return Seq.empty[(String, String)].toDF("ip_addr", "payload")
    ipAddrs.toDF("ip_addr")
      .repartition(math.min(ipAddrs.size, 32))
      .map { r =>
        val ip = r.getString(0)
        (ip, transport.get(buildCmdStr(ip, cmdSubstr)))
      }.toDF("ip_addr", "payload")
  }
}
