package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every loader is a plain parquet scan — filters/column pruning applied by
  * callers reach the scan via Catalyst pushdown, so at 100 TB these become
  * partition-pruned, row-group-skipped columnar reads with no extra work here.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    Sessions.tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** S3 capability check — the Spark analogue of the reference's eager
    * `MODULE LIST` probe (/root/reference/potoos/client.py:22-35): fail
    * fast at construction time if a required source is absent, instead of
    * failing mid-job on an executor.
    */
  def requireTables(dir: String, names: Seq[String]): Unit = {
    val missing = names.filterNot(n => new java.io.File(s"$dir/$n.parquet").exists())
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"required source tables missing under $dir: ${missing.mkString(", ")}")
  }

  /** `events` with a normalized `ts_ms: Long` (epoch millis, UTC) column.
    *
    * The reference models a time series as (timestamp_ms: int64, value:
    * float64) samples under a series key (/root/reference/potoos/models/
    * anomaly.py:7-12, client.py:39). Here: user_id = series key, ts_ms =
    * timestamp, value = value. The parquet `ts` is timestamp[ns]; Spark has
    * no ns timestamp type, so it is read as Long ns (nanosAsLong) and
    * floor-divided to millis — identical truncation to DuckDB's epoch_ms().
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = read(spark, dir, "events")
    val tsMs = raw.schema("ts").dataType match {
      case LongType => expr("ts DIV 1000000") // ns → ms, integer division
      case TimestampType | TimestampNTZType => unix_millis(col("ts").cast(TimestampType))
      case other => sys.error(s"unexpected events.ts type: $other")
    }
    raw.withColumn("ts_ms", tsMs)
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
