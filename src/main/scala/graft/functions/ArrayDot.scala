package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric arrays as a native Catalyst expression.
  *
  * The composed form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * evaluates interpreted — higher-order functions have no codegen —
  * and allocates an intermediate array per row. This expression stays
  * inside whole-stage codegen with a single fused loop, which is the
  * hot path of every similarity operator (bruteForceTopK, lshTopK,
  * ivfTopK, cosineNearDupPairs): per-pair work drops to one loop over
  * the embedding.
  *
  * Semantics mirror the composed form exactly: double math with
  * strict left-to-right summation (deterministic, engine-portable —
  * DuckDB's list_inner_product matches bit-for-bit, see q32/q42/q43
  * oracles); null if either array is null, if lengths differ (zip_with
  * pads with null), or if any element is null. Elements may be float
  * or double; floats are widened per element.
  */
object ArrayDot {
  /** Column API: `dot(a, b)` over array<float|double> columns. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register `array_dot` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDotExpr(exprs(0), exprs(1)), "built-in")

  /** Interpreted path (also the correctness reference for the codegen
    * path — see `OpsLibrarySpec`). */
  def eval(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

case class ArrayDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  /** Float arrays are consumed natively (no per-row array copy); any
    * other numeric element type is implicitly cast to array<double>
    * (so SQL decimal/int literals just work). */
  override def inputTypes: Seq[ColumnBridge.AbsDataType] = Seq(left, right).map {
    e => e.dataType match {
      case ArrayType(FloatType, _) => ArrayType(FloatType)
      case _ => ArrayType(DoubleType)
    }
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"array_dot needs array<float|double>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemIsFloat(left), elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
      int $n = $a.numElements();
      boolean $bad = ($n != $b.numElements());
      double $acc = 0.0;
      for (int $i = 0; !$bad && $i < $n; $i++) {
        if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
        $acc += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
      }
      if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotExpr =
    copy(left = newLeft, right = newRight)
}
