package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left-side point, the most recent right-side row
  * at or before its timestamp, per series key. The canonical time-series
  * operator Spark's SQL layer lacks (DuckDB: native ASOF JOIN; pandas:
  * merge_asof).
  *
  * Built by COMPOSITION (preference (a) of the build ladder), not a
  * custom SparkPlan: union both sides with a side tag, then one
  * `last(..., ignoreNulls)` over a (key, ts, side)-ordered running
  * window carries the latest baseline value forward onto each point.
  * Cost at scale: a single hash-partition-by-key + sort — the same
  * shuffle shape as any windowed op, no custom physical node, full
  * codegen. Ties (point and baseline at the same ts): the baseline sorts
  * first, so the join is inclusive (ts >= baseline ts), matching DuckDB
  * ASOF semantics. Points with no earlier baseline are dropped (inner).
  */
object AsOfJoin {

  /** @param points   (seriesKey, tsMs, value)
    * @param baseline (seriesKey, tsMs, baseline)
    * @return (seriesKey, tsMs, value, baseline)
    */
  def join(points: DataFrame, baseline: DataFrame): DataFrame = {
    val p = points.select(
      col("seriesKey"), col("tsMs"), col("value"),
      lit(null).cast("double").as("_b"), lit(1).as("_side"))
    val b = baseline.select(
      col("seriesKey"), col("tsMs"), lit(null).cast("double").as("value"),
      col("baseline").as("_b"), lit(0).as("_side"))
    val w = Window
      .partitionBy("seriesKey")
      .orderBy(col("tsMs").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(b)
      .withColumn("baseline", last(col("_b"), ignoreNulls = true).over(w))
      .where(col("_side") === 1 && col("baseline").isNotNull)
      .select("seriesKey", "tsMs", "value", "baseline")
  }
}
