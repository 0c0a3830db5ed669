package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-doc (context, token) bigram-position counts as ONE native
  * Catalyst expression over a pre-tokenized array: position i pairs
  * token w_i with context v = w_{i-1} (`<s>` sentinel at i=1 — `<`
  * can never appear in a normalized token), counted per doc inside
  * the kernel. The exploded output IS the compressed per-doc pair
  * table the LM scorer consumes — (v, w, n) rows with no aggregation
  * exchange at all, where the relational explode + groupBy(id, v, w)
  * paid an exchange to merge its map-side partials. Counts are
  * BIT-IDENTICAL to that formulation; every downstream table (vocab
  * counts, type scoring, BIGINT doc totals) is untouched.
  * First-occurrence pair order.
  */
object BigramKernel {

  /** Column API over a token-array column:
    * array<struct<v:string,w:string,n:bigint>>. */
  def pairCounts(tokens: Column): Column =
    ColumnBridge.column(BigramCountsExpr(ColumnBridge.expression(tokens)))
}

/** See [[BigramKernel]]. Null-safe unary; empty array for a tokenless
  * doc (no positions — the caller's explode drops the doc, like the
  * formulation it replaced). */
case class BigramCountsExpr(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", StringType, nullable = false),
      StructField("w", StringType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bigram_counts"

  override def nullSafeEval(input: Any): Any = {
    val toks = MinhashKernel.toStringArray(input.asInstanceOf[ArrayData])
    val n = toks.length
    val counts = new java.util.LinkedHashMap[(String, String), Long]()
    var i = 0
    while (i < n) {
      val v = if (i == 0) "<s>" else toks(i - 1)
      counts.merge((v, toks(i)), 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(
        UTF8String.fromString(e.getKey._1),
        UTF8String.fromString(e.getKey._2),
        e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BigramCountsExpr = copy(child = newChild)
}
