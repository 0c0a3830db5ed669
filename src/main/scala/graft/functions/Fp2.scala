package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Campbell Scientific FP2 16-bit float decode (F26).
  *
  * Layout (public Campbell data-file format docs; behavior mirrored
  * from reference /root/reference/code/file_handling/read_cs_files.py:8-22):
  * sign = bit 15, decimal exponent = bits 13-14, mantissa = bits 0-12;
  * value = +/- mantissa * 10^-exponent. Sentinels: 0x1fff -> +inf,
  * 0x9fff -> -inf, 0x9ffe -> NaN.
  */
object Fp2 {

  /** Scalar decode of the unsigned 16-bit FP2 value. */
  def decode(raw: Int): Double = {
    val v = raw & 0xffff
    if (v == 0x1fff) return Double.PositiveInfinity
    if (v == 0x9fff) return Double.NegativeInfinity
    if (v == 0x9ffe) return Double.NaN
    val mantissa = v & 0x1fff
    val exponent = (v & 0x6000) >> 13
    val x = mantissa * math.pow(10.0, -exponent)
    if ((v & 0x8000) != 0) -x else x
  }

  /** Column API: decode an integral column of raw FP2 values. */
  def fp2(c: Column): Column =
    ColumnBridge.column(Fp2Decode(ColumnBridge.expression(c)))

  /** Register `fp2_decode` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fp2_decode", exprs => Fp2Decode(exprs.head), "built-in")
}

/** Native Catalyst expression with codegen: stays inside whole-stage
  * codegen (unlike a Scala UDF, which breaks the codegen span and pays
  * serialization per row). Null-safe unary over any integral input.
  */
case class Fp2Decode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fp2_decode"

  override def nullSafeEval(input: Any): Any = input match {
    case i: Int => Fp2.decode(i)
    case s: Short => Fp2.decode(s.toInt)
    case l: Long => Fp2.decode(l.toInt)
    case b: Byte => Fp2.decode(b.toInt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Fp2.decode((int) $c)")

  override protected def withNewChildInternal(newChild: Expression): Fp2Decode =
    copy(child = newChild)
}
