package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning heuristics (Raffel et al. 2020, "Exploring the
  * Limits of Transfer Learning with a Unified Text-to-Text
  * Transformer", JMLR §2.2) as one auditable verdict operator:
  *
  *   - LINE rules (applied first, producing the cleaned text): keep
  *     only lines that end in a terminal punctuation mark
  *     (`.` `!` `?` `"` after trimming), contain at least
  *     `minLineWords` words, and do not mention "javascript"
  *     (case-insensitive — the boilerplate-notice rule);
  *   - DOCUMENT rules (verdict on the whole page): drop pages whose
  *     CLEANED text has fewer than `minSentences` sentences
  *     (terminal `.!?` marks in kept lines — the paper counts
  *     sentences; punctuation marks are the deterministic,
  *     engine-portable proxy), pages containing "lorem ipsum" or a
  *     curly brace `{` (code), and pages whose raw token stream
  *     contains any word of `badWords` (whole-token match, not
  *     substring — "classic" must not trip a list entry "ass").
  *
  * Like [[QualityOps.gopherFilter]], the operator emits the FULL
  * signal vector alongside `keep` so rejection reasons stay
  * auditable, plus the cleaned text itself — C4's line rules change
  * the text that survives, unlike Gopher's which only gate.
  *
  * Scale shape: everything is a narrow per-row expression over
  * builtin functions — no shuffle, no join; the filter rides the
  * scan. The line lambdas are per-LINE higher-order functions, not
  * per-character (docs have tens of lines, so interpretation
  * overhead is noise — the fused-kernel rule from the round-11
  * measurements applies to per-character loops, not per-line ones).
  *
  * Reference scope: the reference pipeline has no web-text cleaning
  * (it is a flux-tower ETL); this extends the engine for the
  * large-scale training-data use cases in the build brief.
  */
object C4Ops {

  /** Neutral stand-in list; production callers pass the real one
    * (C4 used the public "bad words" blocklist). Whole-token match. */
  val DefaultBadWords: Seq[String] = Seq("swearword", "slur", "nsfw")

  /** Lines of `text` that survive C4's line rules (terminal
    * punctuation, >= minLineWords words, no "javascript"). */
  def keptLines(text: Column, minLineWords: Int): Column =
    filter(split(text, "\n"), l => {
      val tl = trim(l)
      tl.rlike("[.!?\"]$") &&
        size(array_remove(split(tl, "\\s+"), "")) >= minLineWords &&
        !contains(lower(tl), lit("javascript"))
    })

  /** Full C4 verdict frame: `idCol`, line counts, sentence count,
    * the three document flags, `keep`, and the cleaned text (kept
    * lines re-joined with newlines). */
  def c4Filter(df: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 3, minSentences: Int = 5,
      badWords: Seq[String] = DefaultBadWords): DataFrame = {
    val text = col(textCol)
    val kept = keptLines(text, minLineWords)
    val cleaned = array_join(kept, "\n")
    val rawToks = array_remove(split(lower(text), "[^a-z0-9]+"), "")
    df.select(
      col(idCol),
      size(split(text, "\n")).as("n_lines"),
      size(kept).as("n_kept"),
      (length(cleaned) -
        length(regexp_replace(cleaned, "[.!?]", ""))).as("n_sentences"),
      contains(lower(text), lit("lorem ipsum")).as("has_lorem"),
      contains(text, lit("{")).as("has_brace"),
      arrays_overlap(rawToks,
        array(badWords.map(lit): _*)).as("has_bad_word"),
      cleaned.as("text_out"))
      .withColumn("keep",
        col("n_sentences") >= minSentences &&
        !col("has_lorem") && !col("has_brace") && !col("has_bad_word"))
  }
}
