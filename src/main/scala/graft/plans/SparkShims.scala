package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal access shim: `Dataset.ofRows` (DataFrame from a LogicalPlan) is
  * `private[sql]`, and wrapping a custom logical operator into a user-facing
  * DataFrame is exactly its purpose — the same door SparkSessionExtensions
  * users and spark-connect planners go through. Nothing else from the
  * private surface is touched. */
object GraftDatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark, plan)
}
