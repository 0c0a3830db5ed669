package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL-domain curation: extract the hosts a document links to, rank
  * domains corpus-wide, and drop documents that reference blocklisted
  * domains — the C4/RefinedWeb-style curation step that operates on
  * extracted hosts, not raw text.
  *
  * The host regex is the same engine-portable ASCII dialect as
  * [[ScrubOps]] (no lookarounds; `(?:...)` groups only), so every
  * result is re-derivable in DuckDB/RE2 and oracle-checkable.
  *
  * Blocklist matching is by DOMAIN SUFFIX (an entry `evil.com` blocks
  * `ads.evil.com`), implemented by exploding each host into its
  * suffix chain and equi-joining against the broadcast blocklist —
  * never a `endswith` theta-join, which would force a nested-loop
  * plan. The suffix chain is bounded by the host's label count (~6),
  * so the explode adds a constant factor, and the join key is an
  * exact string: one broadcast hash join at any corpus size.
  *
  * Reference scope: no counterpart in the reference; part of the
  * training-data extension surface of the build brief.
  */
object DomainOps {

  /** URL prefix with optional userinfo; group 1 captures the host
    * (alnum/dot/hyphen — the port/path/query stops the match). */
  val UrlHostPattern: String =
    "https?://(?:[A-Za-z0-9._%+-]+@)?([A-Za-z0-9.-]+)"

  /** Exploded (id, host) rows, one per URL occurrence: hosts are
    * lowercased, `www.`-stripped, trailing-dot-stripped (a sentence
    * period after a bare-host URL lands inside the host class and
    * must not mint a distinct domain). Narrow until the explode;
    * no shuffle. */
  def docHosts(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol).as("id"),
        explode(regexp_extract_all(col(textCol),
          lit(UrlHostPattern), lit(1))).as("raw_host"))
      .select(col("id"),
        regexp_replace(regexp_replace(lower(col("raw_host")),
          "^www\\.", ""), "\\.$", "").as("host"))

  /** Corpus-wide domain ranking: documents linking each host and
    * total occurrences. Per-doc distinct before the count so the
    * doc-count shuffle map-side combines on (host, id) only once
    * per pair. One shuffle on the host. */
  def domainStats(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val h = docHosts(docs, idCol, textCol)
    h.groupBy("host").agg(
      count_distinct(col("id")).as("n_docs"),
      count(lit(1)).as("n_occurrences"))
  }

  /** Every suffix of `host` that starts at a label boundary:
    * `ads.evil.com` -> [ads.evil.com, evil.com, com]. The transform
    * interprets per element, but over a <= ~6-element label array —
    * constant per-row cost, unlike the corpus-length higher-order
    * traps documented on [[TextOps.tokens]]. */
  private def suffixChain = {
    val parts = split(col("host"), "\\.")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts)), "."))
  }

  /** Drop every document that links to a blocklisted domain (suffix
    * match). The blocklist is a curated, genuinely bounded set —
    * broadcast is correct for it; the flagged-id set is CORPUS-derived
    * and is therefore pinned SHUFFLE_HASH on the anti join (the
    * AQE-broadcast-of-a-corpus-derived-side defect the factor-100
    * smoke caught). Returns surviving rows with all columns. */
  def filterBlockedDomains(docs: DataFrame, idCol: String,
      textCol: String, blocklist: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bl = blocklist.map(_.toLowerCase).toDF("blocked")
    val flagged = docHosts(docs, idCol, textCol)
      .select(col("id"), explode(suffixChain).as("suffix"))
      .join(broadcast(bl), col("suffix") === col("blocked"))
      .select(col("id").as(idCol)).distinct()
    docs.join(flagged.hint("shuffle_hash"), Seq(idCol), "left_anti")
  }
}
