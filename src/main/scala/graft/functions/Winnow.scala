package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
  * The [[KernelCodegen]] invoke costs one boxed call per ROW,
  * amortized across the whole per-doc loop (unlike per-element
  * lambda interpretation), and keeps the enclosing stage in
  * WholeStageCodegen.
  *
  * The hash is the paper's own Karp-Rabin polynomial family: base 31
  * over char codes, accumulator seeded with `seed`, mod 2^31 after
  * every step, then one multiplicative FINAL MIX (× 2654435761, the
  * 32-bit golden-ratio constant, mod 2^31). The mix matters: at the
  * defaults (k=5, seed=11) the raw polynomial never wraps the 2^31
  * modulus (max accumulator ≈ 4.3e8), so without it hashes are
  * MONOTONE in char codes and window-min selection systematically
  * favors digit-heavy / low-codepoint k-grams — a content-type bias
  * in fingerprint density. Multiplying by an odd constant mod 2^31
  * is a bijection that wraps ~600× across the raw range, breaking
  * the monotonicity while staying exact BIGINT arithmetic in any SQL
  * engine (intermediates < 2^63; the oracle re-derives hashes with
  * plain ascii/mod — no digest function needed). Still not a
  * dedup-grade 32-bit mix — fine for fingerprint sampling, not for
  * content identity. NOTE: the mix was added in round 12 —
  * fingerprints persisted by earlier builds use the unmixed family
  * and do NOT compare against post-r12 fingerprints.
  */
object Winnow {

  /** Final multiplicative mix (see class doc). Exact for h < 2^31. */
  @inline private[functions] def mix(h: Long): Long =
    (h * 2654435761L) % 2147483648L

  /** Scalar reference implementation (specs + scaladoc contract).
    * Deliberately the naive O(n·w) formulation from the paper — the
    * kernel's O(n) monotonic-deque selection is property-tested
    * against this. */
  def selectScalar(cs: String, k: Int, w: Int, seed: Int)
      : Seq[(Long, Long)] = {
    val n = cs.length - k + 1
    if (n < 1) return Seq.empty
    val hs = Array.tabulate(n) { i =>
      var h = seed.toLong
      var j = 0
      while (j < k) { h = (h * 31 + cs.charAt(i + j)) % 2147483648L; j += 1 }
      mix(h)
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
  * matching the relational formulation it replaced).
  *
  * Input encoding: ASCII inputs take a byte-level fast path (bytes ==
  * char codes, no UTF8String materialization). Non-ASCII inputs —
  * possible through the registered `winnow_select` SQL function,
  * whose callers don't go through [[DedupOps.winnowFingerprints]]'
  * `[^a-z0-9]` cleaning — fall back to UTF-16 char-code iteration,
  * matching [[Winnow.selectScalar]] exactly, so SQL results never
  * silently diverge from the scalar reference.
  *
  * Window-min selection is O(n) via a monotonic deque (indices with
  * strictly increasing hash; pushing pops every back entry with
  * hash >= new, so the front is always the window's RIGHTMOST min —
  * an equal-hash earlier entry can never survive in front of a later
  * one). The scalar reference keeps the paper's naive O(n·w) scan;
  * [[KernelPropertySpec]] pins bit-parity between the two. */
case class WinnowSelect(child: Expression, k: Int, w: Int, seed: Int)
    extends UnaryExpression with KernelCodegen {
  require(k >= 1 && w >= 1, s"k=$k w=$w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("pos", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    // ASCII iff byte count == char count (every UTF-8 multi-byte char
    // inflates bytes past chars).
    val ascii = u.numChars() == bytes.length
    val chars = if (ascii) null else u.toString
    val n = (if (ascii) bytes.length else chars.length) - k + 1
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = seed.toLong
      var j = 0
      while (j < k) {
        val c = if (ascii) bytes(i + j) & 0xff else chars.charAt(i + j).toInt
        h = (h * 31 + c) % 2147483648L
        j += 1
      }
      hs(i) = Winnow.mix(h)
      i += 1
    }
    val nw = math.max(n - w + 1, 1)
    val out = new Array[Any](nw)
    // Monotonic deque over a ring buffer of k-gram indices.
    val dq = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail): front = current min
    var q = 0
    var p = 0
    while (p < nw) {
      val end = math.min(p + w, n)
      while (q < end) { // admit new k-grams; >=: rightmost tie wins
        while (tail > head && hs(dq(tail - 1)) >= hs(q)) tail -= 1
        dq(tail) = q; tail += 1
        q += 1
      }
      while (dq(head) < p) head += 1 // evict out-of-window front
      out(p) = InternalRow(hs(dq(head)), (dq(head) + 1).toLong)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowSelect = copy(child = newChild)
}
