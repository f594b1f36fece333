package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the private[sql] Dataset constructor so the engine can
  * surface custom logical plans (graft.plans.AsOfJoinPlan) as ordinary
  * DataFrames. Lives in the org.apache.spark.sql package solely for
  * access; contains no logic. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Column over a raw catalyst Expression — for expression instances a
    * SQL string cannot spell (e.g. the pinned/non-deterministic
    * [[graft.functions.Sq8Code]] the ADC scan projects exactly once). */
  def exprColumn(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
