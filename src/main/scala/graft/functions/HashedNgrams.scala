package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DSIR's hashed unigram+bigram feature buckets as ONE native
  * Catalyst expression over a pre-tokenized array: for token stream
  * t_1..t_n emit bucket(t_1), then for i>1 bucket(t_i) and
  * bucket(t_{i-1} + " " + t_i) — exactly the feature order of the
  * relational formulation it replaces, with bucket(f) =
  * seededHash32(f, seed) mod B computed BIT-IDENTICALLY: the first 4
  * bytes of md5("<seed>:<f>") as a big-endian unsigned int, mod B.
  * Oracle SQL and spec re-derivations are untouched — this changes
  * where the hash runs, not what it is.
  *
  * WHY: the HOF formulation paid ~3-5 us of per-element
  * interpretation (array-building lambda + flatten + md5 expression
  * chain with hex-string round-trip) per feature occurrence — at two
  * features per token that is the dominant per-row cost of DSIR at
  * corpus scale (measured: 12 s single-core for 50k ~75-token docs).
  * One boxed call per ROW with a reused MessageDigest and raw byte
  * arithmetic (no hex string, no UTF8String concat) cuts that ~10x —
  * the same kernel-over-lambda trade as [[WinnowSelect]], measured in
  * BENCH_NOTES round 11.
  */
object HashedNgrams {

  /** Scalar reference: bucket of one feature string (spec contract —
    * must equal TextOps.seededHash32(f, seed) % buckets). */
  def bucketScalar(f: String, seed: Int, buckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest((seed.toString + ":" + f).getBytes("UTF-8"))
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    h % buckets
  }

  /** Column API over a token-array column. */
  def featureBuckets(tokens: Column, buckets: Int, seed: Int): Column =
    ColumnBridge.column(HashedNgramBuckets(
      ColumnBridge.expression(tokens), buckets, seed))
}

/** See [[HashedNgrams]]. Null-safe unary over array<string>; null
  * tokens inside the array are skipped (TextOps.tokens never emits
  * them — defensive only). Output: array<bigint> of bucket ids, one
  * per feature occurrence (2n-1 entries for n tokens, 0 for empty). */
case class HashedNgramBuckets(child: Expression, buckets: Int, seed: Int)
    extends UnaryExpression with CodegenFallback {
  require(buckets > 0, s"buckets=$buckets")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_ngram_buckets"

  @transient private lazy val seedPrefix =
    (seed.toString + ":").getBytes("UTF-8")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucketOf(bytes: Array[Byte]): Long = {
      md.reset()
      md.update(seedPrefix)
      val d = md.digest(bytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      h % buckets
    }
    val out = new java.util.ArrayList[Any](2 * n)
    var prev: Array[Byte] = null
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok != null) {
        val tb = tok.getBytes
        out.add(bucketOf(tb))
        if (prev != null) {
          val big = new Array[Byte](prev.length + 1 + tb.length)
          System.arraycopy(prev, 0, big, 0, prev.length)
          big(prev.length) = ' '
          System.arraycopy(tb, 0, big, prev.length + 1, tb.length)
          out.add(bucketOf(big))
        }
        prev = tb
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HashedNgramBuckets = copy(child = newChild)
}
