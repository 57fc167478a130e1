package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge to Spark 4's private[sql] plan surfaces, so graft can stand up
  * DataFrames over its own logical nodes (e.g.
  * [[graft.plans.AsOfJoinPlan]]) and guarantee the matching planner
  * strategy is present on any session — including driver-built sessions
  * that were not configured with `spark.sql.extensions`.
  */
object GraftPlanBridge {

  /** DataFrame over a custom logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan backing a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Idempotently add a planner strategy via the session's experimental
    * hook. Graft's strategies are also injected by
    * [[graft.GraftExtensions]]; this runtime path keeps custom-plan APIs
    * working on sessions built without extensions (duplicate
    * registration is harmless — the first strategy that plans a node
    * wins).
    */
  def ensureStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(strategy))
        exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }
}
