package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom membership probe as ONE native codegen expression — the
  * per-row kernel behind [[graft.text.SketchOps.bloomMightContain]].
  *
  * WHY a kernel: the membership test is `AND_i bit(pos_i)` and Spark
  * evaluates `&&` short-circuit, which makes every term after the
  * first CONDITIONAL — conditional subtrees are ineligible for
  * subexpression elimination, so a relational Kirsch–Mitzenmacher
  * form re-evaluates the md5 under each probe (measured: the f100
  * pre-screen arm went 41 → 78 s when the relational KM form doubled
  * the per-probe md5s instead of halving them). Here the digest runs
  * EXACTLY once per row, h1/h2 are two unsigned-32 slices of it, and
  * the k probes are a branchy integer loop over a long[] reference
  * object (no 8k-element array literal in the plan either).
  *
  * Position arithmetic is bit-identical to
  * [[graft.text.SketchOps]]'s relational build side and its DuckDB
  * replay: h1 = md5 hex digits 1–8 as unsigned int (= bytes 0–3
  * big-endian), h2 = hex digits 9–16 forced odd, pos_i =
  * (h1 + i·h2) mod mBits. The build side inserts via the SAME
  * arithmetic ([[graft.text.SketchOps.bloomPositions]]), so probe
  * and build can never drift (spec-pinned: inserted keys always
  * test true through the full build→probe chain).
  */
object BloomKernel {

  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** One md5, k bit probes. `words` is the 32-bit-packed table
    * (long word w holds bits [32w, 32w+32), see SketchOps). */
  def contains(key: UTF8String, words: Array[Long], mBits: Int,
      hashes: Int): Boolean = {
    val md = tlMd.get()
    md.reset()
    val d = md.digest(key.getBytes)
    val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val h2 = (((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) | 1L
    var i = 0
    while (i < hashes) {
      val p = ((h1 + i * h2) % mBits).toInt
      if (((words(p >>> 5) >>> (p & 31)) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  /** Column API over a string key and a dense packed word table. */
  def mightContain(key: Column, words: Array[Long], mBits: Int,
      hashes: Int): Column =
    ColumnBridge.column(BloomContainsExpr(
      ColumnBridge.expression(key), words, mBits, hashes))
}

/** [[BloomKernel.contains]] as a codegen-native unary expression; the
  * word table rides the plan as a reference object. */
case class BloomContainsExpr(child: Expression, words: Array[Long],
    mBits: Int, hashes: Int) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = BooleanType
  override def inputTypes: Seq[ColumnBridge.AbsDataType] = Seq(StringType)
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    BloomKernel.contains(input.asInstanceOf[UTF8String], words, mBits,
      hashes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWordTable", words, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomKernel.contains($c, $w, $mBits, $hashes)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomContainsExpr = copy(child = newChild)
}
