package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayDotExpr, Fp2Decode, NfcNormalize, StripAccentsExpr, WinnowSelect}

/** Session-extension entry point: registers graft's native Catalyst
  * expressions into every session built with
  * `spark.sql.extensions=graft.GraftExtensions` (cluster-wide deploy:
  * set it once in spark-defaults, every SQL user gets `fp2_decode` and
  * `array_dot` with codegen — no per-session registration calls).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fp2_decode"),
      new ExpressionInfo(classOf[Fp2Decode].getName, "fp2_decode"),
      (exprs: Seq[Expression]) => Fp2Decode(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotExpr].getName, "array_dot"),
      (exprs: Seq[Expression]) => ArrayDotExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccentsExpr].getName, "strip_accents"),
      (exprs: Seq[Expression]) => StripAccentsExpr(exprs.head)))
    // winnow_select(cleaned_text, k, w, seed): k/w/seed must be
    // foldable literals — they parameterize the kernel, not the data.
    ext.injectFunction((
      FunctionIdentifier("winnow_select"),
      new ExpressionInfo(classOf[WinnowSelect].getName, "winnow_select"),
      (exprs: Seq[Expression]) => {
        def litInt(e: Expression, name: String): Int = {
          require(e.foldable, s"winnow_select: $name must be a literal")
          e.eval().asInstanceOf[Number].intValue
        }
        WinnowSelect(exprs(0), litInt(exprs(1), "k"),
          litInt(exprs(2), "w"), litInt(exprs(3), "seed"))
      }))
  }
}
