package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** Bridge into Spark's private[sql] Column/Expression plumbing — the
  * narrow way to expose a native Catalyst Expression through the public
  * Column API without a build-time SparkSessionExtensions hook. Lives in
  * the org.apache.spark.sql namespace solely for private[sql] access;
  * contains no Spark code.
  */
object SqlBridgeImpl {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def registerFunction(spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Table-valued function: `SELECT * FROM name(args…)` resolves through
    * the session's TableFunctionRegistry to a LogicalPlan.
    */
  def registerTableFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** DataFrame from a raw LogicalPlan (custom plan nodes). */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed LogicalPlan of a Dataset (to embed as a custom node's child). */
  def analyzedPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed
}
