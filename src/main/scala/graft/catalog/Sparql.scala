package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S15: SPARQL site-metadata source (reference:
  * code/managers/site_details.py:82-160).
  *
  * The reference POSTs a SPARQL query to a metadata endpoint and
  * wrangles the standard SPARQL 1.1 JSON results (head.vars +
  * results.bindings of {type, value} cells) into a per-site frame:
  * the `label` binding becomes the Site key (" Flux Station" suffix
  * and spaces stripped, alias-mapped), declared numeric/date columns
  * are typed, missing strings become ''. Same transport seam as
  * [[graft.sources.LoggerHttp]]: a real POST on deployments, a
  * recorded fixture in tests and the zero-egress sandbox. Parsing is
  * Spark-native `from_json` over the response body.
  */
object Sparql {

  /** POST seam; implementations throw on non-200. */
  trait Transport extends Serializable {
    def post(url: String, body: String,
        headers: Map[String, String]): String
  }

  final class UrlTransport(auth: Option[(String, String)] = None)
      extends Transport {
    @transient private lazy val client = java.net.http.HttpClient
      .newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30)).build()
    def post(url: String, body: String,
        headers: Map[String, String]): String = {
      var b = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(30))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      headers.foreach { case (k, v) => b = b.header(k, v) }
      auth.foreach { case (u, p) =>
        b = b.header("Authorization", "Basic " +
          java.util.Base64.getEncoder.encodeToString(
            s"$u:$p".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
      val rsp = client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (rsp.statusCode() != 200)
        throw new RuntimeException(rsp.body())
      rsp.body()
    }
  }

  final case class FixtureTransport(response: String) extends Transport {
    def post(url: String, body: String,
        headers: Map[String, String]): String = response
  }

  /** SPARQL 1.1 JSON results -> one row per binding, one string
    * column per head var (absent bindings -> null). */
  def resultsToDataFrame(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("head", StructType(Seq(
        StructField("vars", ArrayType(StringType))))),
      StructField("results", StructType(Seq(
        StructField("bindings", ArrayType(MapType(StringType,
          StructType(Seq(
            StructField("type", StringType),
            StructField("value", StringType)))))))))))
    val parsed = Seq(json).toDF("json")
      .select(from_json(col("json"), schema).as("r"))
    val vars = parsed.select(col("r.head.vars")).head().getSeq[String](0)
    parsed.select(explode(col("r.results.bindings")).as("b"))
      .select(vars.map(v => col("b").getItem(v).getField("value").as(v)): _*)
  }

  /** Site label -> standard site name: drop " Flux Station", apply
    * aliases, strip spaces (site_details.py:127-146). */
  def siteLabel(label: org.apache.spark.sql.Column,
      aliases: Map[String, String] = Map.empty): org.apache.spark.sql.Column = {
    val stripped = regexp_replace(label, lit(" Flux Station"), lit(""))
    val aliased = aliases.foldLeft(stripped) { case (c, (from, to)) =>
      when(c === from, lit(to)).otherwise(c)
    }
    regexp_replace(aliased, lit(" "), lit(""))
  }

  /** Full site-details pull: query -> bindings frame -> Site-keyed,
    * typed frame (floatVars cast double, intVars cast int, dateVars
    * cast date, remaining strings null->''). */
  def siteDetails(spark: SparkSession, transport: Transport,
      endpoint: String, query: String,
      headers: Map[String, String] =
        Map("Accept" -> "application/sparql-results+json"),
      aliases: Map[String, String] = Map.empty,
      floatVars: Seq[String] = Seq("elevation", "latitude", "longitude",
        "tower_height", "UTC_offset"),
      intVars: Seq[String] = Seq("time_step", "freq_hz"),
      dateVars: Seq[String] = Seq("date_commissioned",
        "date_decommissioned")): DataFrame = {
    val raw = resultsToDataFrame(spark,
      transport.post(endpoint, query, headers))
    require(raw.columns.contains("label"),
      "site-details query must bind ?label")
    val keyed = raw
      .withColumn("Site", siteLabel(col("label"), aliases))
      .drop("label")
    keyed.columns.foldLeft(keyed) { (d, c) =>
      if (floatVars.contains(c)) d.withColumn(c, col(c).cast("double"))
      else if (intVars.contains(c)) d.withColumn(c, col(c).cast("int"))
      else if (dateVars.contains(c)) d.withColumn(c, col(c).cast("date"))
      else if (c == "Site") d
      else d.withColumn(c, coalesce(col(c), lit("")))
    }
  }
}
