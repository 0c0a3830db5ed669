package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based document quality signals for corpus filtering —
  * the MassiveText/Gopher family: highly repetitive documents (boiler-
  * plate, keyword spam, templated pages) are poor training data and
  * are filtered on (a) the fraction of duplicate lines, (b) the
  * fraction of characters in duplicate lines, and (c) the fraction of
  * characters covered by the most frequent word n-gram.
  *
  * Scale shapes: every signal is an explode + two-level aggregation
  * ((doc, unit) then doc) — the per-unit counts combine map-side, the
  * final reduce is keyed by doc id, and nothing is quadratic in
  * document length (the naive per-element `filter()` lambda over the
  * line array is O(L²) interpreted per doc — the exact
  * higher-order-function trap BENCH_NOTES documents on q65).
  *
  * Reference scope: no counterpart in the reference (flux-tower ETL);
  * part of the training-data extension surface of the build brief.
  */
object QualityOps {

  /** Fixed-width token "lines": the normalized token stream chunked
    * `width` tokens per line (last line ragged). Corpus text that HAS
    * physical lines should split on newlines instead; this shape
    * exists so line-level repetition signals stay defined for
    * single-line documents. Empty docs yield an empty array. */
  def tokenLines(text: Column, width: Int): Column = {
    require(width > 0, "width must be positive")
    val tk = TextOps.tokens(text)
    when(size(tk) > 0,
      transform(sequence(lit(0), floor((size(tk) - 1) / width).cast("int")),
        i => concat_ws(" ", slice(tk, i * width + 1, lit(width)))))
      .otherwise(array().cast("array<string>"))
  }

  /** All word n-grams of the normalized text (NON-distinct — counts
    * are the point here, unlike [[TextOps.shingles]] which backs
    * set-similarity and keeps a short-doc fallback). Docs with fewer
    * than n tokens yield an empty array. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n > 0, "n must be positive")
    val tk = TextOps.tokens(text)
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)),
        i => concat_ws(" ", slice(tk, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document repetition report:
    *
    *   - `n_lines`        — token-line count ([[tokenLines]] width)
    *   - `dup_line_frac`  — 1 − distinct lines / lines (fraction of
    *     line slots occupied by repeats beyond each first occurrence)
    *   - `dup_line_char_frac` — characters in those repeated slots /
    *     characters in all line slots
    *   - `top<n>_char_frac` for each n in `ns` — (occurrences × chars
    *     of the most frequent n-gram) / chars of the whole token
    *     stream. Overlapping occurrences each count, so pathological
    *     repetition can push the ratio past 1 — by design: the signal
    *     is thresholded, not summed.
    *
    * Documents with no tokens report 0 everywhere. One explode +
    * aggregation pair per signal, all reduced on the doc key. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      lineWidth: Int = 10, ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    val id = col(idCol)

    val base = df.select(id, col(textCol).as("__text"))

    // Line signals: (doc, line) counts -> per-doc fractions.
    val lineAgg = base
      .select(id, explode(tokenLines(col("__text"), lineWidth)).as("__line"))
      .groupBy(id, col("__line"))
      .agg(count(lit(1)).as("__cnt"), length(col("__line")).as("__len"))
      .groupBy(id)
      .agg(
        sum(col("__cnt")).as("n_lines"),
        (lit(1.0) - count(lit(1)).cast("double") / sum(col("__cnt")))
          .as("dup_line_frac"),
        (sum((col("__cnt") - 1) * col("__len")).cast("double") /
          sum(col("__cnt") * col("__len"))).as("dup_line_char_frac"))

    // Top-n-gram signals: (doc, gram) counts -> per-doc max coverage.
    val streamChars = base.select(id,
      length(concat_ws(" ", TextOps.tokens(col("__text")))).as("__chars"))
    val topAggs = ns.map { n =>
      base
        .select(id, explode(wordNgrams(col("__text"), n)).as("__g"))
        .groupBy(id, col("__g"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(id)
        .agg(max(col("__c") * length(col("__g"))).as(s"__top$n"))
    }

    val joined = topAggs.foldLeft(streamChars.join(lineAgg, Seq(idCol), "left")) {
      (acc, t) => acc.join(t, Seq(idCol), "left")
    }
    val topCols = ns.map { n =>
      coalesce(
        when(col("__chars") > 0,
          col(s"__top$n").cast("double") / col("__chars")),
        lit(0.0)).as(s"top${n}_char_frac")
    }
    joined.select(
      id +:
      coalesce(col("n_lines"), lit(0L)).as("n_lines") +:
      coalesce(col("dup_line_frac"), lit(0.0)).as("dup_line_frac") +:
      coalesce(col("dup_line_char_frac"), lit(0.0)).as("dup_line_char_frac") +:
      topCols: _*)
  }

  /** Composite Gopher-style keep/drop decision joined onto `df`: a
    * document is kept when every signal is inside its threshold —
    * token count in [minTokens, maxTokens], mean token length in
    * [minMeanTok, maxMeanTok], stopword ratio ≥ minStopword (a
    * no-function-words page is keyword spam), punctuation ratio ≤
    * maxPunct, and the [[repetitionStats]] repetition signals below
    * their caps. Returns the input plus a boolean `keep` and the
    * individual signal columns (so a pipeline can log WHY a document
    * fell out — reject reasons are the thing you audit at 100 TB,
    * not just the survivor set). Thresholds default to the published
    * MassiveText-ish band, loosened where our heuristic differs. */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 50, maxTokens: Long = 100000,
      minMeanTok: Double = 2.0, maxMeanTok: Double = 12.0,
      minStopword: Double = 0.02, maxPunct: Double = 0.25,
      maxDupLineFrac: Double = 0.30, maxDupLineCharFrac: Double = 0.30,
      maxTop2CharFrac: Double = 0.20): DataFrame = {
    val text = col(textCol)
    val sig = df.select(col(idCol), text.as("__t"))
      .select(col(idCol),
        TextOps.tokenCount(col("__t")).cast("long").as("q_tokens"),
        TextOps.meanTokenLength(col("__t")).as("q_mean_tok"),
        TextOps.stopwordRatio(col("__t")).as("q_stopword"),
        TextOps.punctRatio(col("__t")).as("q_punct"))
    val rep = repetitionStats(df, idCol, textCol, lineWidth = 10,
      ns = Seq(2))
    df.join(sig, Seq(idCol)).join(rep, Seq(idCol))
      .withColumn("keep",
        col("q_tokens").between(minTokens, maxTokens) &&
        col("q_mean_tok").between(minMeanTok, maxMeanTok) &&
        col("q_stopword") >= minStopword &&
        col("q_punct") <= maxPunct &&
        col("dup_line_frac") <= maxDupLineFrac &&
        col("dup_line_char_frac") <= maxDupLineCharFrac &&
        col("top2_char_frac") <= maxTop2CharFrac)
  }
}
