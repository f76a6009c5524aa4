package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access bridge for specs: execute a hand-transformed LogicalPlan
  * (classic Dataset.ofRows is private[sql]). Test-support only —
  * production never constructs plans directly; the injected optimizer
  * rule path does. */
object GraftPlanExec {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
