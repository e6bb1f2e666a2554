package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for Spark 4's classic runtime.
  *
  * Spark 4 moved `Column` to the connect-compatible sql-api (it wraps a
  * `ColumnNode`, not an `Expression`), and the conversion helpers in
  * `org.apache.spark.sql.classic.ExpressionUtils` are `private[sql]`.
  * Function-injection via `SparkSessionExtensions` hands us raw
  * `Expression` args and wants an `Expression` back, while the engine's
  * operator bodies are `Column => Column` compositions — so extension
  * registration needs exactly this bridge. Living in a subpackage of
  * `org.apache.spark.sql` to satisfy the access qualifier is the
  * established pattern for Spark extension libraries (Delta, Sedona,
  * Iceberg all ship such shims); nothing here touches internals beyond
  * the two public-shaped converters.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** EAGER node→expression conversion. `ExpressionUtils.expression`
    * wraps the node in a lazy `ColumnNodeExpression`, which is fine
    * inside plan construction but NOT as a function-registry result —
    * the analyzer embeds it unconverted and codegen hits an Unevaluable.
    * The session converter unwraps to a plain (unresolved-function)
    * tree the analyzer then resolves like any parsed expression. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
