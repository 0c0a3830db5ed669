package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Fused SQ8 kernels ([[graft.sim.SqOps]]) — encode and asymmetric
  * L1 scoring as single codegen loops, the [[NearestListsL1]] pattern
  * applied to scalar quantization.
  *
  * Why not the unrolled `element_at` chains SqOps shipped with in
  * r14: an unrolled form generates code LINEAR in the dimension — a
  * d-term Add tree is one generated method, and at production
  * embedding dims (d = 768–1536) that method crosses the JVM 64KB
  * limit, Janino rejects it, and the whole stage silently falls back
  * to interpreted evaluation — the exact defect class the r14 bench
  * sweep fixed in the PQ tier (VERDICT r14 "what's wrong" #2). These
  * kernels generate CONSTANT-size code (one `for` loop each; the
  * per-dimension bounds ride along as a reference-object `long[]`),
  * so d=768 stays inside whole-stage codegen — spec-pinned by
  * `SqOpsSpec`'s d=768 plan assertion.
  *
  * Semantics are bit-identical to the unrolled form on all
  * non-degenerate rows (q118/q119's DuckDB oracles replay the same
  * integer arithmetic):
  *   encode_i = (510·(qv_i − min_i) + span_i) floorDiv (2·span_i),
  *              0 when span_i = 0;
  *   dist     = Σ_i |qv_i − (min_i + (2·code_i·span_i + 255)
  *              floorDiv 510)|.
  * Degenerate inputs (null array, wrong length, null element) yield
  * NULL — the same null the element_at chains propagated. Sums
  * cannot overflow: quantize() bounds |qv_i| ≲ 2^23 and d ≲ 2^11. */
object SqKernels {

  def encode(qv: Column, mins: IndexedSeq[Long],
      spans: IndexedSeq[Long]): Column =
    ColumnBridge.column(SqEncodeExpr(
      ColumnBridge.expression(qv), mins, spans))

  def l1Dist(qv: Column, codes: Column, mins: IndexedSeq[Long],
      spans: IndexedSeq[Long]): Column =
    ColumnBridge.column(SqL1DistExpr(
      ColumnBridge.expression(qv), ColumnBridge.expression(codes),
      mins, spans))

  /** Interpreted encode; also the correctness reference for codegen. */
  def evalEncode(vec: ArrayData, mins: Array[Long],
      spans: Array[Long]): Any = {
    val d = mins.length
    if (vec == null || vec.numElements() != d) return null
    var i = 0
    while (i < d) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Int](d)
    i = 0
    while (i < d) {
      out(i) =
        if (spans(i) == 0L) 0
        else Math.floorDiv(
          510L * (vec.getLong(i) - mins(i)) + spans(i),
          2L * spans(i)).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Interpreted distance; also the correctness reference. */
  def evalDist(vec: ArrayData, codes: ArrayData, mins: Array[Long],
      spans: Array[Long]): Any = {
    val d = mins.length
    if (vec == null || codes == null || vec.numElements() != d ||
      codes.numElements() != d) return null
    var i = 0
    while (i < d) {
      if (vec.isNullAt(i) || codes.isNullAt(i)) return null
      i += 1
    }
    var s = 0L
    i = 0
    while (i < d) {
      val recon = mins(i) + Math.floorDiv(
        2L * codes.getInt(i) * spans(i) + 255L, 510L)
      s += Math.abs(vec.getLong(i) - recon)
      i += 1
    }
    s
  }
}

/** `sq_encode(qv)` — array<bigint> → array<int> of SQ8 codes. */
case class SqEncodeExpr(child: Expression, mins: IndexedSeq[Long],
    spans: IndexedSeq[Long]) extends UnaryExpression {
  require(mins.nonEmpty && mins.length == spans.length,
    "sq_encode: mins/spans must be equal-length and non-empty")
  private val dim = mins.length
  @transient private lazy val minsA = mins.toArray
  @transient private lazy val spansA = spans.toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sq_encode"

  private def checkChildType(): Unit = child.dataType match {
    case ArrayType(LongType, _) => ()
    case other => throw new IllegalArgumentException(
      s"sq_encode needs array<bigint>, got $other")
  }

  override def eval(input: InternalRow): Any = {
    checkChildType()
    SqKernels.evalEncode(child.eval(input).asInstanceOf[ArrayData],
      minsA, spansA)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    checkChildType()
    val childGen = child.genCode(ctx)
    val minsRef = ctx.addReferenceObj("sqMins", minsA, "long[]")
    val spansRef = ctx.addReferenceObj("sqSpans", spansA, "long[]")
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
        int[] $out = new int[$dim];
        for (int $i = 0; $i < $dim; $i++) {
          $out[$i] = $spansRef[$i] == 0L ? 0 : (int) Math.floorDiv(
            510L * (${childGen.value}.getLong($i) - $minsRef[$i])
              + $spansRef[$i],
            2L * $spansRef[$i]);
        }
        ${ev.isNull} = false;
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SqEncodeExpr = copy(child = newChild)
}

/** `sq_l1_dist(qv, codes)` — exact integer L1 between a quantized
  * query vector and an SQ8-decoded candidate, one fused loop. */
case class SqL1DistExpr(left: Expression, right: Expression,
    mins: IndexedSeq[Long], spans: IndexedSeq[Long])
    extends BinaryExpression {
  require(mins.nonEmpty && mins.length == spans.length,
    "sq_l1_dist: mins/spans must be equal-length and non-empty")
  private val dim = mins.length
  @transient private lazy val minsA = mins.toArray
  @transient private lazy val spansA = spans.toArray

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_l1_dist"

  private def checkChildTypes(): Unit = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(IntegerType, _)) => ()
    case other => throw new IllegalArgumentException(
      s"sq_l1_dist needs (array<bigint>, array<int>), got $other")
  }

  override def eval(input: InternalRow): Any = {
    checkChildTypes()
    SqKernels.evalDist(
      left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData], minsA, spansA)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    checkChildTypes()
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val minsRef = ctx.addReferenceObj("sqMins", minsA, "long[]")
    val spansRef = ctx.addReferenceObj("sqSpans", spansA, "long[]")
    val valid = ctx.freshName("valid")
    val i = ctx.freshName("i")
    val s = ctx.freshName("s")
    val recon = ctx.freshName("recon")
    ev.copy(code =
      code"""
      ${lGen.code}
      ${rGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      boolean $valid = !${lGen.isNull} && !${rGen.isNull}
        && ${lGen.value}.numElements() == $dim
        && ${rGen.value}.numElements() == $dim;
      if ($valid) {
        for (int $i = 0; $valid && $i < $dim; $i++) {
          if (${lGen.value}.isNullAt($i) ||
              ${rGen.value}.isNullAt($i)) $valid = false;
        }
      }
      if ($valid) {
        long $s = 0L;
        for (int $i = 0; $i < $dim; $i++) {
          long $recon = $minsRef[$i] + Math.floorDiv(
            2L * ${rGen.value}.getInt($i) * $spansRef[$i] + 255L, 510L);
          $s += Math.abs(${lGen.value}.getLong($i) - $recon);
        }
        ${ev.isNull} = false;
        ${ev.value} = $s;
      }
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqL1DistExpr =
    copy(left = newLeft, right = newRight)
}
