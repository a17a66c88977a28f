package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for `private[sql]` Column↔Expression conversions —
  * Spark 4 removed the public `new Column(expr)` path; extension
  * libraries place this shim inside the sql package namespace (the
  * standard pattern used by Spark-native libraries). Kept to exactly
  * two forwarders. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
