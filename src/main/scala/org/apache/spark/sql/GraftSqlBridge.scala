package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-visibility shim for `Dataset.ofRows` (private[sql]) — the one
  * hook a library needs to hand a custom LogicalPlan back to the public
  * DataFrame API. Standard pattern for third-party Spark extensions; no
  * Spark behavior is altered. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
