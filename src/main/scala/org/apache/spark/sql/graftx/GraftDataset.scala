package org.apache.spark.sql.graftx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** DataFrame-from-LogicalPlan bridge (same private[sql] access pattern as
  * [[GraftFunctions]]): lets graft wrap its custom logical nodes
  * ([[graft.plans.AsOfJoin]]) back into the public DataFrame API. */
object GraftDataset {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** The analyzed logical plan under a DataFrame (resolved attributes). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
