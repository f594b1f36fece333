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
}
