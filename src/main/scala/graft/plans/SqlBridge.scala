package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: turn a hand-built [[LogicalPlan]] into a
  * DataFrame. `Dataset.ofRows` is package-private by design (user code is
  * meant to stay on the DataFrame API); a custom-operator library
  * legitimately needs this one entry point to hand its logical nodes to
  * the analyzer, exactly as Delta/Iceberg/XSQL-style extensions do. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
