package graft

import org.apache.spark.sql.SparkSession

/** Driver-conditions smoke: builds a VANILLA session (none of Sessions'
  * configs — the driver owns its own session) and runs the SparkEntry
  * contract exactly as the driver would: entry() row count plus a few
  * queries. Exists so every round can re-check the runtime-conf seam
  * (UTC, nanosAsLong) that Tables.read applies via Sessions.tune.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n (expect > 0)")
    require(n > 0, "entry() returned no rows")
    Seq("ts_range", "anomaly_derivative_scores", "dedup_minhash_lsh").foreach { q =>
      val c = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      println(s"[smoke] $q rows=$c")
    }
    spark.stop()
  }
}
