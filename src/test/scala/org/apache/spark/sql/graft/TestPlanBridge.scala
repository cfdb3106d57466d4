package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** Test-scope bridge for specs that must build a DataFrame from a
  * hand-constructed LogicalPlan (e.g. a [[org.apache.spark.sql.catalyst
  * .plans.logical.MapInPandas]] node, which the Scala Dataset API cannot
  * produce without a live Python runtime). Lives in this package because
  * `Dataset.ofRows` is private[sql]. */
object TestPlanBridge {
  def dfFromPlan(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
