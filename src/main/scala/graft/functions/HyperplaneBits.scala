package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All random-hyperplane LSH band keys of a vector in ONE fused
  * codegen loop.
  *
  * The composed form (`bands × rowsPerBand` separate `ArrayDot`s
  * against 64-element array literals, summed into band keys) builds an
  * expression tree of `planes × dim` literal nodes — at the library's
  * corpus-scale default (8 × 16 planes over 64 dims that's ~8k nodes)
  * codegen either blows up compile time or falls back to interpreted
  * eval per row. This expression embeds the plane matrix as one flat
  * reference object and emits a tight two-level loop; the per-row cost
  * is exactly `planes × dim` multiply-adds.
  *
  * Key semantics mirror the composed form bit-for-bit (and the DuckDB
  * oracle's CASE WHEN list_inner_product >= 0 mirror): band b's key
  * sets bit r iff dot(vec, plane[b·rows+r]) >= 0.0, with strict
  * sequential summation; a null / wrong-length / null-element vector
  * yields ALL-ZERO keys (the composed `when(dot >= 0, ...).otherwise(0)`
  * turns a null dot into an unset bit), never a null array.
  */
object HyperplaneBits {
  /** Column API: array<long> of length `bands`; planes.length must be
    * bands * rowsPerBand, all rows the same dimension. */
  def bandKeys(vec: Column, planes: Seq[Seq[Double]], bands: Int,
      rowsPerBand: Int): Column =
    ColumnBridge.column(HyperplaneBitsExpr(
      ColumnBridge.expression(vec), planes, bands, rowsPerBand))

  def eval(vec: ArrayData, isFloat: Boolean, flat: Array[Double],
      bands: Int, rows: Int, dim: Int): ArrayData = {
    val keys = new Array[Long](bands)
    if (vec != null && vec.numElements() == dim) {
      var ok = true
      var j = 0
      while (ok && j < dim) { if (vec.isNullAt(j)) ok = false; j += 1 }
      if (ok) {
        var p = 0
        while (p < bands * rows) {
          var acc = 0.0
          var i = 0
          val base = p * dim
          while (i < dim) {
            val x = if (isFloat) vec.getFloat(i).toDouble
              else vec.getDouble(i)
            acc += x * flat(base + i)
            i += 1
          }
          if (acc >= 0.0) keys(p / rows) |= 1L << (p % rows)
          p += 1
        }
      }
    }
    new GenericArrayData(keys)
  }
}

case class HyperplaneBitsExpr(child: Expression, planes: Seq[Seq[Double]],
    bands: Int, rowsPerBand: Int) extends UnaryExpression {
  require(planes.length == bands * rowsPerBand,
    s"planes ${planes.length} != bands $bands * rowsPerBand $rowsPerBand")
  require(rowsPerBand <= 63, "band keys are packed into a long")
  private val dim = planes.head.length
  require(planes.forall(_.length == dim), "ragged plane matrix")

  @transient private lazy val flat: Array[Double] = planes.flatten.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hyperplane_bits"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"hyperplane_bits needs array<float|double>, got $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    HyperplaneBits.eval(v.asInstanceOf[ArrayData], elemIsFloat, flat,
      bands, rowsPerBand, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val mat = ctx.addReferenceObj("planesFlat", flat, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val keys = ctx.freshName("keys")
    val ok = ctx.freshName("ok")
    val j = ctx.freshName("j")
    val p = ctx.freshName("p")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val base = ctx.freshName("base")
    ev.copy(code =
      code"""
      ${childGen.code}
      long[] $keys = new long[$bands];
      if (!${childGen.isNull} && ${childGen.value}.numElements() == $dim) {
        boolean $ok = true;
        for (int $j = 0; $ok && $j < $dim; $j++) {
          if (${childGen.value}.isNullAt($j)) $ok = false;
        }
        if ($ok) {
          for (int $p = 0; $p < ${bands * rowsPerBand}; $p++) {
            double $acc = 0.0;
            int $base = $p * $dim;
            for (int $i = 0; $i < $dim; $i++) {
              $acc += ((double) ${childGen.value}.$get($i)) * $mat[$base + $i];
            }
            if ($acc >= 0.0) $keys[$p / $rowsPerBand] |= 1L << ($p % $rowsPerBand);
          }
        }
      }
      final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HyperplaneBitsExpr = copy(child = newChild)
}
