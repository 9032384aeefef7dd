package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge to the `private[sql]` plan-construction surface (Spark 4 moved
  * the classic implementations behind `classic.*`): build a DataFrame from
  * a custom LogicalPlan, read a DataFrame's analyzed plan, and register an
  * extra planner strategy on a live session. One-file shim inside the sql
  * package namespace — the standard pattern for Catalyst extension
  * libraries that ship whole custom operators. */
object PlanShim {

  private def classicSession(s: SparkSession) =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(classicSession(spark), plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Idempotently append a planner strategy to the session. */
  def addStrategy(spark: SparkSession, st: SparkStrategy): Unit = {
    val exp = classicSession(spark).experimental
    if (!exp.extraStrategies.contains(st))
      exp.extraStrategies = exp.extraStrategies :+ st
  }
}
