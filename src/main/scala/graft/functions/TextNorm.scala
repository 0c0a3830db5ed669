package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus preprocessing: canonical
  * composition (NFC) and accent stripping (NFD + drop combining
  * marks), as native Catalyst expressions so they ride whole-stage
  * codegen in the scan stage — normalization feeds every dedup /
  * fingerprint / tokenize pass, so it must not break the codegen span
  * the way a UDF would.
  *
  * Both kernels are JDK-only (`java.text.Normalizer`, UAX #15) and
  * engine-portable: DuckDB's `nfc_normalize` and `strip_accents`
  * (utf8proc) implement the same Unicode algorithms, which is what
  * lets the oracle re-derive normalized text exactly. The byte-level
  * contract is pinned by the q83 oracle over decomposed/precomposed/
  * mixed corpora.
  *
  * Scale shape: pure narrow expressions — no shuffle, no state; a
  * 100 TB normalize is exactly a parquet scan.
  */
object TextNorm {

  /** Canonical composition (NFC): decomposed sequences (`e` +
    * U+0301) fold to their precomposed form (`é`). Idempotent. */
  def nfcImpl(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: NFC is the identity on ASCII (and on most already-
    // composed text); isNormalized avoids the copy.
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Accent strip: canonical decomposition, then drop every combining
    * mark (Unicode category Mn) — `café` -> `cafe`, `MÜNCHEN` ->
    * `MUNCHEN`. Characters whose diacritic is not a combining mark
    * (`ø`, `ł`) are untouched, matching utf8proc/DuckDB
    * `strip_accents`. */
  def stripAccentsImpl(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s // NFD and mark-drop are identity on ASCII
    val d = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val ch = d.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column API: NFC-normalize a string column. */
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  /** Column API: strip accents (NFD + drop combining marks). */
  def stripAccents(c: Column): Column =
    ColumnBridge.column(StripAccentsExpr(ColumnBridge.expression(c)))

  /** Canonical corpus text normalization: NFC -> lowercase ->
    * optional accent strip -> whitespace collapse -> trim. The
    * standard preprocessing in front of exact dedup / fingerprinting,
    * where `Café  au\tlait` and `cafe au lait` must collide iff the
    * pipeline says accents don't matter. Order matters and is pinned
    * by the oracle: lowercasing happens on the composed form (one
    * codepoint per letter), stripping after, so both engines walk the
    * same codepoints. */
  def normalizeText(c: Column, accentStrip: Boolean = false): Column = {
    val composed = lower(nfc(c))
    val stripped = if (accentStrip) stripAccents(composed) else composed
    trim(regexp_replace(stripped, "\\s+", " "))
  }

  /** 128-bit fingerprint of the normalized text — the key exact dedup
    * groups on when normalization-invariant identity is wanted. */
  def normalizedFingerprint(c: Column, accentStrip: Boolean = false): Column =
    md5(normalizeText(c, accentStrip))
}

/** NFC normalization as a codegen-native unary expression. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    TextNorm.nfcImpl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfcImpl($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Accent stripping as a codegen-native unary expression. */
case class StripAccentsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(input: Any): Any =
    TextNorm.stripAccentsImpl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.stripAccentsImpl($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : StripAccentsExpr = copy(child = newChild)
}
