package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer training + application (Sennrich et al. 2016) —
  * the tokenizer-building step of an LLM data pipeline, done the way
  * production tokenizers are actually trained: learn the merge table
  * from a SAMPLE of the corpus, apply it to everything.
  *
  *   - LEARNING is driver-side by design and fully deterministic:
  *     the sample is the md5-coordinate order statistic
  *     ([[SampleOps.hashCoord]] — identical on any partitioning/
  *     engine/re-run), its word-frequency table is cut to the top
  *     `maxWords` by the exact (count DESC, word ASC) order via
  *     orderBy+limit (TakeOrderedAndProject — a parameter-bounded
  *     driver merge, the DSIR top-k pattern), and the classic merge
  *     loop runs over that ≤ maxWords-row dict. Nothing corpus-sized
  *     ever reaches the driver; tie-breaks (max pair count, then
  *     lexicographic pair) are total, so the learned table is
  *     reproducible bit-for-bit.
  *   - APPLICATION is distributed via the fused
  *     [[graft.functions.BpeApplyExpr]] kernel: the merge table is
  *     parameter-sized and rides the expression tree; the corpus
  *     never shuffles.
  *
  * The merge LOOP is not expressible in set-oriented SQL (each merge
  * rewrites the adjacency the next lookup keys on), so the oracle
  * (q106) hash-checks an invariant RESTATEMENT of the output
  * instead: per-doc reconstruction (the subword stream concatenates
  * back to the normalized token stream — DuckDB re-derives the md5
  * from `text` alone), subword-count bounds (n_tok ≤ n_subwords ≤
  * n_chars), and the learned merge-table size. The exact
  * segmentation is additionally pinned by the spec layer
  * (hand-derived merge sequences, determinism properties, partition
  * invariance).
  */
object BpeOps {

  /** Learned model: ranked merges (rank = position). */
  final case class BpeModel(merges: Seq[(String, String)])

  /** Learn `numMerges` merges from a deterministic sample of
    * `sampleRate` of the docs (hash-coordinate membership), over the
    * top `maxWords` words of the sample. */
  def learnBpe(df: DataFrame, idCol: String, textCol: String,
      numMerges: Int, sampleRate: Double = 0.1,
      maxWords: Int = 10000, salt: String = "bpe"): BpeModel = {
    require(numMerges >= 0, s"numMerges=$numMerges")
    val sampled = SampleOps.sampleFraction(
      df.select(col(idCol), col(textCol)), idCol, sampleRate, salt)
    val words = sampled
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    BpeModel(learnMerges(words, numMerges))
  }

  /** The classic merge loop over a (word, count) dict — driver-side,
    * O(numMerges · total symbols). Deterministic: best pair = max
    * summed count, ties to the lexicographically smallest pair. */
  private[graft] def learnMerges(words: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var dict = words.map { case (w, c) =>
      (w.map(_.toString).toVector, c) }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = scala.collection.mutable
        .HashMap.empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) =>
          (-c, a, b) }._1
        merges += best
        dict = dict.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toVector, c)
        }
        m += 1
      }
    }
    merges.toSeq
  }

  /** Apply a learned model: adds `subwords` (the doc's full subword
    * stream) and `n_subwords`. Narrow — rides the scan. */
  def applyBpe(df: DataFrame, textCol: String, model: BpeModel)
      : DataFrame = {
    val subs = graft.functions.BpeKernel.applyMerges(
      TextOps.tokens(col(textCol)), model.merges)
    df.withColumn("subwords", subs)
      .withColumn("n_subwords", size(col("subwords")))
  }

  /** Tokenizer-health (fertility / vocab-coverage) report — the
    * standard audit run before committing a tokenizer to a training
    * run (e.g. the fertility tables of Rust et al. 2021, "How Good is
    * Your Tokenizer?", ACL): per group (source, lang, …), the exact
    * integer counts behind the three health ratios. Ratios are
    * deliberately READER-side (exact integers hash identically across
    * engines; dividing is the reader's one-liner):
    *
    *   - fertility        = n_subwords / n_words   (subwords per word)
    *   - bytes per subword = n_word_bytes / n_subwords
    *   - OOV-byte share   = n_singleton_bytes / n_word_bytes — the
    *     share of word bytes the vocabulary only covers by
    *     single-character fallback (a length-1 subword is exactly one
    *     byte here: tokens are [a-z0-9] runs). High singleton share
    *     per (source, lang) = the merge table was trained on other
    *     text and will explode sequence lengths on this slice.
    *
    * Scale shape: the per-doc tokenize + merge application is one
    * narrow pass (the [[graft.functions.BpeApplyExpr]] kernel, X38);
    * the only exchange is the final partial-aggregated groupBy on the
    * low-cardinality group key. Null texts count toward `n_docs` and
    * nothing else. */
  def fertilityReport(docs: DataFrame, textCol: String,
      groupCols: Seq[String], model: BpeModel): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val subs = graft.functions.BpeKernel.applyMerges(toks, model.merges)
    docs
      .select(groupCols.map(col) ++
        Seq(toks.as("__toks"), subs.as("__subs")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(size(col("__toks")).cast("long")), lit(0L))
          .as("n_words"),
        coalesce(sum(length(concat_ws("", col("__toks"))).cast("long")),
          lit(0L)).as("n_word_bytes"),
        coalesce(sum(size(col("__subs")).cast("long")), lit(0L))
          .as("n_subwords"),
        coalesce(sum(size(filter(col("__subs"),
          s => length(s) === 1)).cast("long")), lit(0L))
          .as("n_singleton_bytes"))
  }
}
