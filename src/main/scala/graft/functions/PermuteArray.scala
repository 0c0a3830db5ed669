package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Fixed-permutation gather over an `array<float>` column — the
  * apply step of the OPQ-style coordinate permutation
  * ([[graft.sim.OpqOps]]): `out[i] = vec[perm[i]]` in one fused
  * codegen loop, constant code size at any dimension (the
  * [[SqKernels]] discipline — an unrolled `array(getItem...)` form
  * is linear in d and falls out of codegen at production embedding
  * dims). The permutation rides along as a reference-object int[].
  *
  * Degenerate inputs (null array, wrong length, null element) yield
  * NULL, the family convention ([[NearestListsL1]]). */
object PermuteArray {

  def gather(vec: Column, perm: IndexedSeq[Int]): Column =
    ColumnBridge.column(PermuteArrayExpr(
      ColumnBridge.expression(vec), perm))

  /** Interpreted path; also the correctness reference for codegen. */
  def evalGather(vec: ArrayData, perm: Array[Int]): Any = {
    val d = perm.length
    if (vec == null || vec.numElements() != d) return null
    var i = 0
    while (i < d) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Float](d)
    i = 0
    while (i < d) { out(i) = vec.getFloat(perm(i)); i += 1 }
    new GenericArrayData(out)
  }
}

case class PermuteArrayExpr(child: Expression, perm: IndexedSeq[Int])
    extends UnaryExpression {
  require(perm.nonEmpty && perm.sorted == perm.indices.toIndexedSeq,
    s"not a permutation of 0..${perm.length - 1}")
  private val dim = perm.length
  @transient private lazy val permA = perm.toArray

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "permute_array"

  private def checkChildType(): Unit = child.dataType match {
    case ArrayType(FloatType, _) => ()
    case other => throw new IllegalArgumentException(
      s"permute_array needs array<float>, got $other")
  }

  override def eval(input: InternalRow): Any = {
    checkChildType()
    PermuteArray.evalGather(
      child.eval(input).asInstanceOf[ArrayData], permA)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    checkChildType()
    val childGen = child.genCode(ctx)
    val permRef = ctx.addReferenceObj("perm", permA, "int[]")
    val valid = ctx.freshName("valid")
    val i = ctx.freshName("i")
    val out = ctx.freshName("out")
    ev.copy(code =
      code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      boolean $valid = !${childGen.isNull}
        && ${childGen.value}.numElements() == $dim;
      if ($valid) {
        for (int $i = 0; $valid && $i < $dim; $i++) {
          if (${childGen.value}.isNullAt($i)) $valid = false;
        }
      }
      if ($valid) {
        float[] $out = new float[$dim];
        for (int $i = 0; $i < $dim; $i++) {
          $out[$i] = ${childGen.value}.getFloat($permRef[$i]);
        }
        ${ev.isNull} = false;
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PermuteArrayExpr = copy(child = newChild)
}
