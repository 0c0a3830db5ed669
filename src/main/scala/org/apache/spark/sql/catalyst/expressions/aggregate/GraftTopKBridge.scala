package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's bounded-heap top-k aggregate (`CollectTopK`,
  * the engine behind ml's prediction top-k), which is scoped
  * `private[aggregate]` in Spark 4 — same pattern as
  * [[org.apache.spark.sql.graftbridge.ColumnBridge]]: the file lives
  * in the access scope so [[graft.functions.TopK]] can build the
  * aggregate expression without copying the heap implementation. */
object GraftTopKBridge {
  /** `reverse = true` keeps the k SMALLEST elements under the child
    * type's interpreted ordering and evals them sorted ascending
    * (best first). Partial aggregation bounds each map task's
    * contribution at k rows per group. */
  def collectTopK(child: Expression, num: Int, reverse: Boolean): Expression =
    CollectTopK(child, num, reverse).toAggregateExpression()
}
