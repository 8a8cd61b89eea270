package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ raw Catalyst Expression bridge (Spark 4's Connect-unified
  * `Column` wraps a ColumnNode, so the Spark-3 `new Column(expr)` door is
  * gone and `ExpressionUtils` is `private[sql]`). Lets graft's typed column
  * helpers build their native expressions DIRECTLY, so they resolve in any
  * SparkSession — `call_function` instead requires the session to have
  * registered [[graft.GraftExtensions]], which silently narrows a public
  * helper's contract to extension-configured sessions only. SQL-text
  * queries still need the extension (the parser resolves by registry);
  * these helpers no longer do. Delegates to a shim in the spark.sql
  * namespace (the standard extension-library access pattern — e.g.
  * frameless's `FramelessInternals`). */
private[graft] object Cols {
  def of(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColBridge.of(e)
  def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColBridge.expr(c)
}
