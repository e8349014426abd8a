package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory for mains and tests.
  *
  * local[32] single-JVM here, but every config choice is made for a real
  * multi-executor cluster: AQE on (runtime re-plan, skew-join splitting,
  * partition coalescing), shuffle partitions sized to the box rather than
  * the 200 default, UTC so timestamp arithmetic matches the DuckDB oracle.
  */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // testdata events.ts is parquet timestamp[ns]; Spark has no nanosecond
      // timestamp type, so surface it as a raw Long (ns since epoch) and let
      // Tables.events normalize to epoch millis.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply the session-level conf this engine needs on a session we did not
    * build (e.g. the driver's own). All of these are dynamic SQLConf entries.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark
  }
}
