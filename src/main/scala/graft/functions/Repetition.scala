package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Gopher/MassiveText repetition signals as ONE native Catalyst
  * expression over a pre-tokenized array: token-line duplicate
  * fractions and top-n-gram character coverage, all per-doc pure
  * functions with state bounded by document length (a hash map of the
  * doc's own lines/grams — never corpus state).
  *
  * Output struct (field order fixed):
  *   n_lines, dup_line_frac, dup_line_char_frac,
  *   then one top<n>_char_frac per requested n.
  *
  * Arithmetic matches the relational formulation BIT-FOR-BIT: the
  * same long-integer counts divided in the same IEEE order
  * (1.0 − distinct/total; Σ(cnt−1)·len / Σcnt·len; max(cnt·len) /
  * stream chars), so oracle SQL is untouched. Tokenless docs report
  * zeros; short-of-n docs report 0 coverage — both exactly what the
  * left-join + coalesce chain produced.
  *
  * WHY: the relational path paid one corpus-wide (doc, unit) shuffle
  * + join-back PER SIGNAL (lines, each n-gram size — three shuffles
  * and three joins at the default parameters), and built lines/grams
  * through interpreted HOF lambdas besides. Same kernel-over-lambda
  * trade as [[WinnowSelect]]/[[MinhashSig]] (BENCH_NOTES round 11).
  */
object RepetitionKernel {

  /** Column API over a token-array column. */
  def stats(tokens: Column, lineWidth: Int, ns: Seq[Int]): Column =
    ColumnBridge.column(RepetitionStatsExpr(
      ColumnBridge.expression(tokens), lineWidth, ns))
}

/** See [[RepetitionKernel]]. */
case class RepetitionStatsExpr(child: Expression, lineWidth: Int,
    ns: Seq[Int]) extends UnaryExpression with KernelCodegen {
  require(lineWidth > 0, "lineWidth must be positive")
  require(ns.nonEmpty && ns.forall(_ > 0), s"ns=$ns")

  override def dataType: DataType = StructType(
    Seq(
      StructField("n_lines", LongType, nullable = false),
      StructField("dup_line_frac", DoubleType, nullable = false),
      StructField("dup_line_char_frac", DoubleType, nullable = false)) ++
    ns.map(n =>
      StructField(s"top${n}_char_frac", DoubleType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any = {
    val toks = MinhashKernel.toStringArray(input.asInstanceOf[ArrayData])
    val nTok = toks.length
    val out = new Array[Any](3 + ns.length)
    if (nTok == 0) {
      out(0) = 0L; out(1) = 0.0; out(2) = 0.0
      var i = 0
      while (i < ns.length) { out(3 + i) = 0.0; i += 1 }
      return InternalRow.fromSeq(out.toIndexedSeq)
    }

    // Token lines: width-chunks of the stream, last line ragged.
    val lineCounts = new java.util.HashMap[String, Long]()
    val sb = new java.lang.StringBuilder
    var totalLines = 0L
    var start = 0
    while (start < nTok) {
      sb.setLength(0)
      var j = start
      val end = math.min(start + lineWidth, nTok)
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val line = sb.toString
      lineCounts.merge(line, 1L, (a, b) => a + b)
      totalLines += 1L
      start += lineWidth
    }
    var dupChars = 0L
    var allChars = 0L
    val it = lineCounts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val len = e.getKey.length.toLong
      val cnt = e.getValue
      dupChars += (cnt - 1L) * len
      allChars += cnt * len
    }
    out(0) = totalLines
    out(1) = 1.0 - lineCounts.size.toDouble / totalLines.toDouble
    out(2) = dupChars.toDouble / allChars.toDouble

    // Stream chars: the space-joined token stream length.
    var streamChars = (nTok - 1).toLong
    var t = 0
    while (t < nTok) { streamChars += toks(t).length; t += 1 }

    // Top-n-gram coverage per requested n (non-distinct windows).
    var ni = 0
    while (ni < ns.length) {
      val n = ns(ni)
      var top = 0L
      if (nTok >= n) {
        val gramCounts = new java.util.HashMap[String, Long]()
        var s = 0
        while (s <= nTok - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(s + j))
            j += 1
          }
          gramCounts.merge(sb.toString, 1L, (a, b) => a + b)
          s += 1
        }
        val git = gramCounts.entrySet().iterator()
        while (git.hasNext) {
          val e = git.next()
          val cover = e.getValue * e.getKey.length.toLong
          if (cover > top) top = cover
        }
      }
      out(3 + ni) =
        if (streamChars > 0L) top.toDouble / streamChars.toDouble else 0.0
      ni += 1
    }
    InternalRow.fromSeq(out.toIndexedSeq)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : RepetitionStatsExpr = copy(child = newChild)
}
