package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken 2003,
  * SIGMOD) as ONE native Catalyst expression: hash every char k-gram
  * of the (pre-cleaned, ASCII) input, slide a window of `w` hashes,
  * keep each window's minimum — RIGHTMOST occurrence on ties, the
  * paper's rule. Output: array<struct<h:bigint,pos:bigint>> with one
  * entry per window (duplicates across windows retained — dedupe at
  * the relational layer, where `distinct` shuffles 16-byte rows).
  *
  * WHY an expression and not higher-order functions: winnowing is an
  * O(n·w) imperative scan with a data dependence between positions —
  * exactly what HOF lambdas evaluate worst. Both HOF formulations
  * were measured on 5k ~300-char docs (sf0.1, local[32]): the staged
  * md5 version spent 18.6 s (digest per k-gram), and replacing md5
  * with an arithmetically-cheaper base-31 polynomial made it 65 s —
  * per-element interpretation overhead (~25 boxed expression nodes
  * per position) dominates, not the hash. The same loop as a fused
  * kernel runs in well under a second. This is preference order (b)
  * of the build brief — a custom Catalyst expression where built-in
  * operators can't express the semantics efficiently — the same
  * pattern as [[Fp2Decode]] and the sim-kernel expressions.
  * CodegenFallback costs one boxed call per ROW, amortized across the
  * whole per-doc loop (unlike per-element lambda interpretation).
  *
  * The hash is the paper's own Karp-Rabin polynomial family: base 31
  * over char codes, accumulator seeded with `seed`, mod 2^31 after
  * every step (every intermediate < 2^36 — exact BIGINT arithmetic in
  * any engine, so a SQL oracle re-derives hashes with plain
  * ascii/mod; no digest function needed). Not a dedup-grade 32-bit
  * mix — fine for fingerprint sampling, not for content identity.
  */
object Winnow {

  /** Scalar reference implementation (specs + scaladoc contract). */
  def selectScalar(cs: String, k: Int, w: Int, seed: Int)
      : Seq[(Long, Long)] = {
    val n = cs.length - k + 1
    if (n < 1) return Seq.empty
    val hs = Array.tabulate(n) { i =>
      var h = seed.toLong
      var j = 0
      while (j < k) { h = (h * 31 + cs.charAt(i + j)) % 2147483648L; j += 1 }
      h
    }
    (0 until math.max(n - w + 1, 1)).map { p =>
      val end = math.min(p + w, n)
      var minH = Long.MaxValue; var pos = -1
      var q = p
      while (q < end) {
        if (hs(q) <= minH) { minH = hs(q); pos = q } // <=: rightmost tie
        q += 1
      }
      (minH, (pos + 1).toLong)
    }
  }

  /** Column API over a CLEANED (lowercase alnum ASCII) string column. */
  def winnowSelect(cleaned: Column, k: Int, w: Int, seed: Int): Column =
    ColumnBridge.column(
      WinnowSelect(ColumnBridge.expression(cleaned), k, w, seed))
}

/** See [[Winnow]]. Null-safe unary; empty array when the input is
  * shorter than k (no k-grams — the caller's explode drops the doc,
  * matching the relational formulation it replaced). */
case class WinnowSelect(child: Expression, k: Int, w: Int, seed: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, s"k=$k w=$w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("pos", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any = {
    // Cleaned input is ASCII by contract, so bytes == char codes —
    // no UTF8String -> String materialization per row.
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length - k + 1
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = seed.toLong
      var j = 0
      while (j < k) { h = (h * 31 + (bytes(i + j) & 0xff)) % 2147483648L; j += 1 }
      hs(i) = h
      i += 1
    }
    val nw = math.max(n - w + 1, 1)
    val out = new Array[Any](nw)
    var p = 0
    while (p < nw) {
      val end = math.min(p + w, n)
      var minH = Long.MaxValue
      var pos = -1
      var q = p
      while (q < end) {
        if (hs(q) <= minH) { minH = hs(q); pos = q } // <=: rightmost tie
        q += 1
      }
      out(p) = InternalRow(minH, (pos + 1).toLong)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowSelect = copy(child = newChild)
}
