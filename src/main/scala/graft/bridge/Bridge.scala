package graft.bridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** Public-side alias of the spark-namespace bridge. */
object SqlBridge {
  def column(e: Expression): Column = org.apache.spark.sql.graft.SqlBridgeImpl.column(e)
  def expression(c: Column): Expression = org.apache.spark.sql.graft.SqlBridgeImpl.expression(c)
  def registerFunction(spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    org.apache.spark.sql.graft.SqlBridgeImpl.registerFunction(spark, name, builder)
  def registerTableFunction(spark: SparkSession, name: String, builder: Seq[Expression] => LogicalPlan): Unit =
    org.apache.spark.sql.graft.SqlBridgeImpl.registerTableFunction(spark, name, builder)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.graft.SqlBridgeImpl.ofRows(spark, plan)
  def analyzedPlan(df: Dataset[_]): LogicalPlan =
    org.apache.spark.sql.graft.SqlBridgeImpl.analyzedPlan(df)
}
