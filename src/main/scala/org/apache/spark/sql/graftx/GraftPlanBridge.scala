package org.apache.spark.sql.graftx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway the engine's custom logical operators
  * need: wrap a hand-built `LogicalPlan` back into a `DataFrame` so it
  * flows through the normal analyze → optimize → plan pipeline (where the
  * injected `SparkStrategy` picks it up). Lives in an `org.apache.spark.
  * sql` subpackage solely to satisfy the `private[sql]` access scope of
  * `classic.Dataset.ofRows` — the same pattern every Spark extension
  * library uses; nothing else of Spark's internals is touched here.
  */
object GraftPlanBridge {

  /** Unanalyzed logical plan of an existing frame (the child of a custom
    * logical node under construction — `ofRows` re-analyzes the whole
    * tree, custom node included).
    */
  def planOf(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.logical

  /** DataFrame over a hand-built logical plan. */
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  /** Column over a hand-built catalyst Expression (and back) — the typed
    * entry point for custom expressions that take non-SQL-expressible
    * constructor arguments (ClassBestScores carries a BOUND score
    * expression), where the `injectFunction` + `call_function` route
    * can't apply.
    */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  def expressionOf(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Catalyst's float-key normalization (`NormalizeFloatingNumbers.
    * normalize`: -0.0 → 0.0, one canonical NaN, incl. nested types) for
    * custom operators' grouping keys — the optimizer rule itself only
    * visits built-in nodes.
    */
  def normalizeFloats(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
      .normalize(e)

  /** Idempotently add a planner strategy to an ALREADY-BUILT session (the
    * runtime analogue of `SparkSessionExtensions.injectPlannerStrategy`,
    * for sessions that didn't pass `spark.sql.extensions` at build time —
    * same role as `GraftExtensions.install` for functions).
    */
  def addStrategy(s: SparkSession,
                  st: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = s.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(st))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ st
  }
}
