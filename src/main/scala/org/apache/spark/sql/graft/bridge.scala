package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters — the
  * standard pattern for extension libraries that ship custom Catalyst
  * expressions (Spark 4 routes Column through ColumnNode; the public API
  * deliberately hides the classic Expression constructor). Kept to the
  * two minimal forwarders. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The classic session's stable `sessionUUID` (`private[sql]` in
    * Spark 4) — never reused across sessions, unlike an identity hash
    * after GC; keys the session-scoped build memos. None for a
    * non-classic implementation. */
  def sessionUUID(s: org.apache.spark.sql.SparkSession): Option[String] =
    s match {
      case c: org.apache.spark.sql.classic.SparkSession =>
        Some(c.sessionUUID)
      case _ => None
    }
}
