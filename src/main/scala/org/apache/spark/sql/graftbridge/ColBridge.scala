package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** `private[sql]` access shim for [[graft.functions.Cols]] — lives under
  * `org.apache.spark.sql` solely to reach `classic.ExpressionUtils`, the
  * only supported Column↔Expression door in Spark 4 (the public
  * `new Column(expr)` constructor was removed by the Connect unification,
  * SPARK-49426). Standard extension-library pattern (frameless, delta). */
object ColBridge {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
