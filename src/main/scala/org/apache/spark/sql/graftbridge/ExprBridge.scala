package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge.
  *
  * Spark 4 made `Column` carry an abstract `ColumnNode` instead of a
  * catalyst `Expression`; the conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. This shim (compiled into an `org.apache.spark.sql`
  * subpackage, the standard extension-point pattern) re-exports exactly
  * the two conversions graft's custom expressions need. Classic-session
  * only — which is what [[graft.GraftSession]] builds.
  */
object ExprBridge {
  /** Wrap a catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column built by the classic API into its expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fully convert a Column into a catalyst expression TREE.
    *
    * [[expression]] wraps functions-API nodes in a lazy
    * `ColumnNodeExpression` placeholder — fine when the result is
    * consumed back through the classic Column API (select/filter),
    * which converts the whole tree at plan build, but unusable as a
    * bare expression handed to the analyzer (a SQL FunctionRegistry
    * builder's return value): the placeholder is Unevaluable and never
    * resolves. This variant runs Spark's own node→expression converter
    * eagerly; function calls come back as `UnresolvedFunction`, which
    * the analyzer's fixed-point resolves exactly as it would in a
    * parsed query. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
