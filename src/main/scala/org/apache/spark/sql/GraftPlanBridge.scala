package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the one `private[sql]` door an extension library needs:
  * materializing a custom [[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]
  * node (e.g. graft's AsOfJoinPlan) as a [[DataFrame]] so it flows
  * through the normal analyzer → optimizer → planner pipeline, where an
  * injected Strategy picks its physical operator. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
