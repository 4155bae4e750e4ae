package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge for constructing a DataFrame from an engine-built
  * [[LogicalPlan]] node. `Dataset.ofRows` is `private[sql]`, so the
  * one-line accessor lives in this package — the same pattern public
  * Spark extension libraries use to hand custom logical operators to
  * the session. Nothing else in the engine lives outside `graft`.
  */
object GraftPlanApi {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
