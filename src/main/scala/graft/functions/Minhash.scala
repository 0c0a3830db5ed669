package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** MinHash signature as ONE native Catalyst expression over a
  * pre-tokenized array: build the doc's DISTINCT k-token shingle set
  * (tokens joined with a single space; a doc shorter than k tokens
  * collapses to one whole-doc shingle, matching
  * [[graft.text.DedupOps.shingleRows]]), then for each of n seeds
  * take the minimum of the packed md5 hash family
  * (`TextOps.seededHash32Packed`: lane `i mod 4` of
  * md5("<i div 4>:<shingle>"), 8 hex chars as an unsigned int) —
  * BIT-IDENTICAL values to the relational formulation, so oracle SQL
  * and banding downstream are untouched. Null for a doc with no
  * tokens (the relational path emits no rows for it — callers filter
  * nulls to preserve that absence).
  *
  * WHY: the relational signature path paid THREE corpus-wide
  * shuffles before any candidate pair existed — the shingle window
  * (partitionBy id), the (id, shingle) distinct, and the groupBy(id)
  * signature fold. The signature is a per-doc pure function of the
  * token stream; this kernel computes it narrowly in the scan
  * projection, so the FIRST exchange of the whole MinHash-LSH chain
  * is the band-key join itself. One md5 per (shingle, 4-seed lane
  * group), reused MessageDigest, no hex-string round-trip — the
  * [[WinnowSelect]]/[[HashedNgramBuckets]] kernel-over-lambda trade
  * (BENCH_NOTES round 11).
  */
object MinhashKernel {

  /** Scalar reference: lane hash of one shingle under seed i (spec
    * contract — must equal TextOps.seededHash32Packed(s, i)). */
  def laneHashScalar(s: String, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(((i / 4).toString + ":" + s).getBytes("UTF-8"))
    val o = 4 * (i % 4)
    ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
      ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
  }

  /** Column API over a token-array column. */
  def signature(tokens: Column, k: Int, n: Int): Column =
    ColumnBridge.column(MinhashSig(
      ColumnBridge.expression(tokens), k, n))
}

/** See [[MinhashKernel]]. Output: array<bigint> length n, or null for
  * a tokenless doc. */
case class MinhashSig(child: Expression, k: Int, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && n >= 1, s"k=$k n=$n")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  private val groups = (n + 3) / 4

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    if (nTok == 0) return null
    val toks = new Array[String](nTok)
    var i = 0
    while (i < nTok) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val shingles = new java.util.HashSet[String]()
    if (nTok < k) shingles.add(toks.mkString(" "))
    else {
      val sb = new java.lang.StringBuilder
      var s = 0
      while (s <= nTok - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(s + j))
          j += 1
        }
        shingles.add(sb.toString)
        s += 1
      }
    }
    val mins = Array.fill(n)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val it = shingles.iterator()
    while (it.hasNext) {
      val sh = it.next()
      val shBytes = sh.getBytes("UTF-8")
      var g = 0
      while (g < groups) {
        md.reset()
        md.update((g.toString + ":").getBytes("UTF-8"))
        val d = md.digest(shBytes)
        var lane = 0
        while (lane < 4) {
          val seed = g * 4 + lane
          if (seed < n) {
            val o = 4 * lane
            val h = ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
              ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
            if (h < mins(seed)) mins(seed) = h
          }
          lane += 1
        }
        g += 1
      }
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinhashSig = copy(child = newChild)
}
