package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column/Expression conversion —
  * Spark 4 removed the public `new Column(expr)` constructor, and
  * custom Catalyst expressions still need to surface as `Column`s.
  * Lives under org.apache.spark.sql to satisfy the access modifier.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` in Spark 4; expressions
    * outside the sql package that implement `inputTypes` reference it
    * through this alias. */
  type AbsDataType = org.apache.spark.sql.types.AbstractDataType

}
