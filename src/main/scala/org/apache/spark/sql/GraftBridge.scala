package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard pattern for libraries that add native Catalyst expressions on
  * Spark 4.x (where `new Column(expr)` no longer exists). Kept to the two
  * minimal entry points. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** If `c` is a sort-order column (`col.asc`/`col.desc` …), return the
    * wrapped child column; otherwise `c` unchanged. Needed because a
    * SortOrder is Unevaluable: passing an order column into a value
    * expression (hash, comparison) fails at codegen. On Spark 4 the
    * wrapping lives at the ColumnNode layer (the catalyst Expression is
    * a lazy ColumnNodeExpression, so matching catalyst SortOrder never
    * fires) — strip at the node. */
  def stripSortOrder(c: Column): Column = c.node match {
    case so: internal.SortOrder => Column(so.child)
    case _ => c
  }

  /** Build a DataFrame from a hand-constructed logical plan (the custom-
    * operator entry point; `Dataset.ofRows` is `private[sql]`). */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a planner strategy to a live session — lets custom
    * operators work on sessions that were not built with
    * `withExtensions(new GraftExtensions)`. */
  def registerStrategy(
      spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
