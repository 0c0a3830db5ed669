package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Minimum exact integer L1 distance from a quantized vector to a
  * plan-embedded seed set, in one fused codegen loop — the scoring
  * kernel of the deterministic greedy-d² (farthest-point) coarse
  * seeder ([[graft.sim.PqOps.farthestPointSeeds]], VERDICT r15 ask
  * #5).
  *
  * The relational form (`least` over |S| `aggregate(zip_with(...))`
  * evaluations, or `array_min` over a seed-literal `transform`)
  * grows the projection with the seed count: at |S| = 255 the
  * generated code either blows the JIT's 8 KB inline budget or falls
  * back to interpreted HOF evaluation — the exact defect class the
  * [[NearestListsL1]] kernel removed from list assignment. Here the
  * seed matrix is ONE flat `long[]` plan reference and the loop is
  * |S|×dim long adds with an early-exit (a partial sum already over
  * the running min abandons that seed), so codegen size is CONSTANT
  * in |S|.
  *
  * Null semantics mirror [[NearestListsL1]]: null input, wrong
  * length, or any null element → NULL (such rows drop out of the
  * seeder's `> 0` filter instead of polluting the argmax). Sums
  * cannot overflow: |qv − s| ≲ 2^23 per component and dim ≲ 2^11
  * keep every partial far inside Long. */
object MinDistL1 {

  /** `minDist(qv, seeds)` over an array<bigint> column. */
  def minDist(qv: Column, seeds: Seq[Seq[Long]]): Column =
    ColumnBridge.column(MinDistL1Expr(
      ColumnBridge.expression(qv),
      seeds.map(_.toIndexedSeq).toIndexedSeq))

  /** Interpreted path; also the correctness reference for codegen. */
  def eval(vec: ArrayData, flat: Array[Long], dim: Int): Any = {
    if (vec == null || vec.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val s = flat.length / dim
    var best = Long.MaxValue
    var j = 0
    while (j < s) {
      var d = 0L
      var k = 0
      val base = j * dim
      while (k < dim && d < best) {
        d += Math.abs(vec.getLong(k) - flat(base + k))
        k += 1
      }
      if (d < best) best = d
      j += 1
    }
    best
  }
}

case class MinDistL1Expr(child: Expression,
    seeds: IndexedSeq[IndexedSeq[Long]]) extends UnaryExpression {
  require(seeds.nonEmpty, "empty seed set")
  private val dim = seeds.head.length
  require(seeds.forall(_.length == dim), "ragged seed matrix")

  @transient private lazy val flat: Array[Long] = {
    val a = new Array[Long](seeds.length * dim)
    var j = 0
    while (j < seeds.length) {
      var i = 0
      while (i < dim) { a(j * dim + i) = seeds(j)(i); i += 1 }
      j += 1
    }
    a
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "min_dist_l1"

  private def checkChildType(): Unit = child.dataType match {
    case ArrayType(LongType, _) => ()
    case other => throw new IllegalArgumentException(
      s"min_dist_l1 needs array<bigint>, got $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    checkChildType()
    MinDistL1.eval(child.eval(input).asInstanceOf[ArrayData], flat, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    checkChildType()
    val childGen = child.genCode(ctx)
    val matRef = ctx.addReferenceObj("minDistFlat", flat, "long[]")
    val s = seeds.length
    val valid = ctx.freshName("valid")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val d = ctx.freshName("d")
    val base = ctx.freshName("base")
    val best = ctx.freshName("bst")
    ev.copy(code =
      code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      boolean $valid = !${childGen.isNull}
        && ${childGen.value}.numElements() == $dim;
      if ($valid) {
        for (int $i = 0; $valid && $i < $dim; $i++) {
          if (${childGen.value}.isNullAt($i)) $valid = false;
        }
      }
      if ($valid) {
        long $best = Long.MAX_VALUE;
        for (int $j = 0; $j < $s; $j++) {
          long $d = 0L;
          int $base = $j * $dim;
          for (int $i = 0; $i < $dim && $d < $best; $i++) {
            $d += Math.abs(${childGen.value}.getLong($i)
              - $matRef[$base + $i]);
          }
          if ($d < $best) $best = $d;
        }
        ${ev.isNull} = false;
        ${ev.value} = $best;
      }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinDistL1Expr = copy(child = newChild)
}
