package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** DataFrame ↔ LogicalPlan bridge (companion of [[ColumnBridge]]):
  * building a DataFrame from a custom logical node requires
  * `Dataset.ofRows`, which Spark 4 keeps private[sql] — hosted here in
  * the org.apache.spark.sql namespace for the same reason ColumnBridge
  * is. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
