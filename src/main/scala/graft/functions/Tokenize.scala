package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused whitespace/alnum tokenizer — the engine's single hottest
  * text kernel (VERDICT r16 ask #2: every f100 text smoke named the
  * regex tokenizer the dominant cost, ≈23 s per tokenizing pass at
  * 27M tokens; q138's task time was tokenizer-bound even after
  * staging).
  *
  * Semantics are EXACTLY [[graft.text.TextOps.tokens]]'s relational
  * form, which every tok-CTE oracle pins:
  * `array_remove(split(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
  * " +"), "")`. In that chain every codepoint of the LOWERCASED text
  * outside `[a-z0-9]` (ASCII space included) acts as a separator and
  * consecutive separators collapse, so the token set is precisely the
  * maximal runs of `[a-z0-9]` in `lower(text)`. The kernel therefore
  * (1) lowercases via `UTF8String.toLowerCase` — the same collation
  * call Spark's `lower()` lowers with, so Unicode edge cases (KELVIN
  * SIGN → k, İ → i + combining dot) fold identically — and (2) scans
  * the lowered UTF-8 BYTES once: bytes `a–z0–9` extend the current
  * token, every other byte ends it. Byte-level is sound because in
  * UTF-8 an ASCII byte value only ever encodes that ASCII character
  * (continuation bytes are ≥ 0x80), and WHICH non-alnum codepoint
  * separated two tokens never matters after collapse.
  *
  * vs the regex chain: one pass, zero regex machinery, no
  * intermediate lowered/replaced/split copies — and still inside
  * whole-stage codegen ([[graft.functions.TextNorm]] pattern).
  * [[tokenCount]] additionally skips the array allocation entirely
  * (counting run starts), for the many call sites that only need
  * `size(tokens(text))`. Parity with the relational form is
  * property-spec-pinned; the oracle surface pins it end-to-end.
  */
object Tokenize {

  /** Maximal `[a-z0-9]` runs of the lowercased text, in order. */
  def tokensImpl(s: UTF8String): GenericArrayData = {
    val b = s.toLowerCase.getBytes
    val out = new java.util.ArrayList[UTF8String](8 + b.length / 6)
    var i = 0; var start = -1
    while (i < b.length) {
      val c = b(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) {
        out.add(UTF8String.fromBytes(b, start, i - start)); start = -1
      }
      i += 1
    }
    if (start >= 0) out.add(UTF8String.fromBytes(b, start, b.length - start))
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }

  /** `size(tokensImpl)` without building the array: counts run
    * starts over the same byte scan. */
  def tokenCountImpl(s: UTF8String): Int = {
    val b = s.toLowerCase.getBytes
    var i = 0; var n = 0; var inTok = false
    while (i < b.length) {
      val c = b(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) { if (!inTok) { n += 1; inTok = true } }
      else inTok = false
      i += 1
    }
    n
  }

  def tokens(c: Column): Column =
    ColumnBridge.column(TokenizeExpr(ColumnBridge.expression(c)))

  def tokenCount(c: Column): Column =
    ColumnBridge.column(TokenCountExpr(ColumnBridge.expression(c)))
}

/** The fused tokenizer as a codegen-native unary expression.
  * ExpectsInputTypes (ADVICE r17): without the declared contract,
  * SQL-registered `graft_tokens(123)` passes analysis and dies at
  * runtime in generated code; with it, non-string input is a clean
  * analysis error (int/string literals still coerce via the
  * standard implicit-cast rule). */
case class TokenizeExpr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  // containsNull = true matches split()'s array type exactly, so the
  // swap is schema-invisible to every downstream plan and oracle
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def inputTypes: Seq[ColumnBridge.AbsDataType] = Seq(StringType)
  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(input: Any): Any =
    Tokenize.tokensImpl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tokenize.tokensImpl($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenizeExpr =
    copy(child = newChild)
}

/** Token count over the same byte scan, no array allocation. */
case class TokenCountExpr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[ColumnBridge.AbsDataType] = Seq(StringType)
  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(input: Any): Any =
    Tokenize.tokenCountImpl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tokenize.tokenCountImpl($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
}
