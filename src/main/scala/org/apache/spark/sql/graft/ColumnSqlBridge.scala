package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ColumnNodeToExpressionConverter

/** Minimal private-API bridge (the established Spark-library pattern — a
  * file inside the org.apache.spark.sql namespace) exposing the ONE internal
  * hook graft.core.ModelIO needs: a Column's Catalyst expression rendered as
  * re-parseable SQL. `Column#toString` renders the ColumnNode in
  * function-call form (`*(a, b)`), which `expr()` cannot parse; converting
  * the node to a real Catalyst expression first gives standard SQL. */
object ColumnSqlBridge {
  def sql(c: Column): String = ColumnNodeToExpressionConverter(c.node).sql
}
