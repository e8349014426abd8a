package graft

import graft.queries.Queries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory (SURVEY.md §2 coverage):
  *  - ts_*            → F1–F7 filters/order/limit + A1–A12 bucketed aggs
  *  - anomaly_*       → D0–D16 detection suite (exp_avg, derivative,
  *                      default, bitmap, absolute/diff-percent/sign-test,
  *                      thresholding, window assembly, metadata)
  *  - q1_agg, q3_top_orders, q_topk, q_window_running, q_anti_join,
  *    q_star_revenue → general relational layer (scan-agg, broadcast
  *    star joins, top-k, windows, anti join)
  *  - text_, dedup_, sim_, mm_ prefixes → LLM-data-pipeline extensions
  */
object SparkEntry {

  /** Flagship: full anomaly pipeline (scan → guard → derivative scores →
    * percent-of-max threshold → window assembly) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.byName("anomaly_windows").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the LSH/bitmap variants whose
    * exact counterparts are oracled instead (rows-only check there).
    */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
