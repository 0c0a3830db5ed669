package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DSIR's hashed unigram+bigram feature-bucket COUNTS as ONE native
  * Catalyst expression over a pre-tokenized array: for token stream
  * t_1..t_n the features are t_1, then for i>1 t_i and
  * t_{i-1} + " " + t_i, with bucket(f) = seededHash32(f, seed) mod B
  * computed BIT-IDENTICALLY to the relational chain: the first 4
  * bytes of md5("<seed>:<f>") as a big-endian unsigned int, mod B —
  * counted per doc inside the kernel, so the exploded output is the
  * final (bucket, n) table with no aggregation exchange. Oracle SQL
  * and spec re-derivations are untouched — this changes where the
  * hash and the count run, not what they are.
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

  /** Column API over a token-array column: per-doc (bucket, n)
    * counts. */
  def featureBucketCounts(tokens: Column, buckets: Int, seed: Int): Column =
    ColumnBridge.column(HashedNgramCountsExpr(
      ColumnBridge.expression(tokens), buckets, seed))
}

/** See [[HashedNgrams]]. Null-safe unary over array<string>; null
  * tokens inside the array are skipped (TextOps.tokens never emits
  * them — defensive only). Output: the doc's COMPRESSED feature
  * stream, array<struct<bucket:bigint,n:bigint>> — per-doc bucket
  * counts, already the final (id, bucket, n) rows once exploded, so
  * the consumer needs NO aggregation exchange at all (the earlier
  * occurrence-stream variant still paid a groupBy exchange to merge
  * the map-side partials). First-occurrence bucket order. */
case class HashedNgramCountsExpr(child: Expression, buckets: Int, seed: Int)
    extends UnaryExpression with KernelCodegen {
  require(buckets > 0, s"buckets=$buckets")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "hashed_ngram_counts"

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
    val counts = new java.util.LinkedHashMap[java.lang.Long, Long]()
    def add(b: Long): Unit = counts.merge(b, 1L, (x, y) => x + y)
    var prev: Array[Byte] = null
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok != null) {
        val tb = tok.getBytes
        add(bucketOf(tb))
        if (prev != null) {
          val big = new Array[Byte](prev.length + 1 + tb.length)
          System.arraycopy(prev, 0, big, 0, prev.length)
          big(prev.length) = ' '
          System.arraycopy(tb, 0, big, prev.length + 1, tb.length)
          add(bucketOf(big))
        }
        prev = tb
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(
        e.getKey.longValue(), e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HashedNgramCountsExpr = copy(child = newChild)
}
