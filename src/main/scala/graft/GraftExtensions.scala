package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst functions so SQL users get them without touching the
  * Scala API. Wire with either
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * Kept to function injection on purpose: SURVEY §4 verified that no
  * custom optimizer Rule or SparkStrategy is required for the
  * reference's operator inventory — the seam is here when one is.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("fp2_decode"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.Fp2Decode].getName, "fp2_decode"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.Fp2Decode(exprs.head)))
  }
}
