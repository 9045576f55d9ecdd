package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door the custom-operator layer needs:
  * constructing a DataFrame from a hand-built LogicalPlan
  * (`Dataset.ofRows`). Lives inside the `org.apache.spark.sql` package
  * tree for access; everything else in graft uses only public API. */
object Shims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Spark 4's Column wraps a ColumnNode, not a catalyst Expression.
    * `ExpressionUtils.expression` only produces a LAZY
    * `ColumnNodeExpression` wrapper (non-serializable, breaks task
    * closures); the eager classic converter yields a real catalyst tree
    * (e.g. an actual `expressions.SortOrder` for `col.desc`). */
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Inverse direction: wrap a hand-built catalyst Expression as a public
    * Column (for custom expressions used without SQL registration). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Float/double key canonicalization (NaN bit patterns, -0.0) for
    * custom operators that group or partition by raw UnsafeRow bytes.
    * Catalyst applies `NormalizeFloatingNumbers` only to the operators
    * it knows (Aggregate/Window/Join); a custom node must normalize its
    * own keys or distinct NaN bit patterns split one logical key group.
    * No-op on expressions without floating-point content. */
  def normalizeFloats(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
