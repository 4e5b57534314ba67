package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the sql-internal Dataset constructor for the engine's
  * custom logical plans (the [[ColumnBridge]] pattern one level up:
  * plans instead of expressions). A custom operator node built outside
  * `org.apache.spark.sql` has no public way back into a DataFrame.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
