package graft.ops

import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import graft.plans.AsOfJoinPlan

/** User-facing as-of join over the custom plan (graft/plans/AsOfJoin.scala):
  * left-outer as-of — every left row, plus the latest right row of the
  * same key with time <= the left time (NULLs when none).
  *
  * Key and time columns must be LongType (epoch micros). Requires the
  * AsOfJoinStrategy registered by GraftExtensions (graft.Sessions does).
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    GraftPlanBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }
}
