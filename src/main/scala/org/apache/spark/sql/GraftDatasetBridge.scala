package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` DataFrame-from-LogicalPlan constructor —
  * what a library needs to hand a custom logical operator (see
  * [[graft.plans.AsOfJoinNode]]) back to the public Dataset API. */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
