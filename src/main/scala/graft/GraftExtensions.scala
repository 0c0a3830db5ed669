package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayDotExpr, BigramCountsExpr, ChunkWindowsExpr, DistinctShingles, Fp2Decode, HashedNgramCountsExpr, MinhashSig, NfcNormalize, PositionedWindows, RepetitionStatsExpr, SimhashWords, StripAccentsExpr, TokenCountExpr, TokenizeExpr, WinnowSelect}

/** Session-extension entry point: registers graft's native Catalyst
  * expressions into every session built with
  * `spark.sql.extensions=graft.GraftExtensions` (cluster-wide deploy:
  * set it once in spark-defaults, every SQL user gets `fp2_decode` and
  * `array_dot` with codegen — no per-session registration calls).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Arity guard for the unary kernels (ADVICE r17): `exprs.head` on
    // an empty argument list is an opaque NoSuchElementException; a
    // require turns `graft_tokens()` into a readable analysis error.
    def one(fn: String)(exprs: Seq[Expression]): Expression = {
      require(exprs.length == 1,
        s"$fn expects exactly 1 argument, got ${exprs.length}")
      exprs.head
    }
    ext.injectFunction((
      FunctionIdentifier("fp2_decode"),
      new ExpressionInfo(classOf[Fp2Decode].getName, "fp2_decode"),
      (exprs: Seq[Expression]) => Fp2Decode(one("fp2_decode")(exprs))))
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotExpr].getName, "array_dot"),
      (exprs: Seq[Expression]) => ArrayDotExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(one("nfc_normalize")(exprs))))
    ext.injectFunction((
      FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccentsExpr].getName, "strip_accents"),
      (exprs: Seq[Expression]) => StripAccentsExpr(one("strip_accents")(exprs))))
    // Text-kernel family. Numeric parameters must be foldable
    // literals — they parameterize the kernels, not the data.
    def litInt(fn: String)(e: Expression, name: String): Int = {
      require(e.foldable, s"$fn: $name must be a literal")
      e.eval().asInstanceOf[Number].intValue
    }
    ext.injectFunction((
      FunctionIdentifier("winnow_select"),
      new ExpressionInfo(classOf[WinnowSelect].getName, "winnow_select"),
      (exprs: Seq[Expression]) => {
        val li = litInt("winnow_select") _
        WinnowSelect(exprs(0), li(exprs(1), "k"),
          li(exprs(2), "w"), li(exprs(3), "seed"))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => {
        val li = litInt("minhash_sig") _
        MinhashSig(exprs(0), li(exprs(1), "k"), li(exprs(2), "n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[TokenizeExpr].getName, "graft_tokens"),
      (exprs: Seq[Expression]) => TokenizeExpr(one("graft_tokens")(exprs))))
    ext.injectFunction((
      FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(
        classOf[TokenCountExpr].getName, "graft_token_count"),
      (exprs: Seq[Expression]) => TokenCountExpr(one("graft_token_count")(exprs))))
    ext.injectFunction((
      FunctionIdentifier("simhash_words"),
      new ExpressionInfo(classOf[SimhashWords].getName, "simhash_words"),
      (exprs: Seq[Expression]) => SimhashWords(one("simhash_words")(exprs))))
    ext.injectFunction((
      FunctionIdentifier("bigram_counts"),
      new ExpressionInfo(classOf[BigramCountsExpr].getName, "bigram_counts"),
      (exprs: Seq[Expression]) => BigramCountsExpr(one("bigram_counts")(exprs))))
    ext.injectFunction((
      FunctionIdentifier("hashed_ngram_counts"),
      new ExpressionInfo(
        classOf[HashedNgramCountsExpr].getName, "hashed_ngram_counts"),
      (exprs: Seq[Expression]) => {
        val li = litInt("hashed_ngram_counts") _
        HashedNgramCountsExpr(exprs(0),
          li(exprs(1), "buckets"), li(exprs(2), "seed"))
      }))
    ext.injectFunction((
      FunctionIdentifier("distinct_shingles"),
      new ExpressionInfo(
        classOf[DistinctShingles].getName, "distinct_shingles"),
      (exprs: Seq[Expression]) => DistinctShingles(exprs(0),
        litInt("distinct_shingles")(exprs(1), "k"))))
    ext.injectFunction((
      FunctionIdentifier("positioned_windows"),
      new ExpressionInfo(
        classOf[PositionedWindows].getName, "positioned_windows"),
      (exprs: Seq[Expression]) => PositionedWindows(exprs(0),
        litInt("positioned_windows")(exprs(1), "k"))))
    ext.injectFunction((
      FunctionIdentifier("chunk_windows"),
      new ExpressionInfo(
        classOf[ChunkWindowsExpr].getName, "chunk_windows"),
      (exprs: Seq[Expression]) => {
        val li = litInt("chunk_windows") _
        ChunkWindowsExpr(exprs(0), li(exprs(1), "chunk"),
          li(exprs(2), "stride"))
      }))
    // repetition_stats(tokens, line_width, n1[, n2, ...])
    ext.injectFunction((
      FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(
        classOf[RepetitionStatsExpr].getName, "repetition_stats"),
      (exprs: Seq[Expression]) => {
        val li = litInt("repetition_stats") _
        RepetitionStatsExpr(exprs(0), li(exprs(1), "line_width"),
          exprs.drop(2).zipWithIndex.map { case (e, i) =>
            li(e, s"n$i") })
      }))
  }
}
