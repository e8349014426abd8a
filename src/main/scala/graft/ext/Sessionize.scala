package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream (builder brief: the
  * event-analytics operator every training-data/telemetry pipeline needs).
  *
  * A session is a maximal run of a key's events where consecutive
  * timestamps are ≤ `gapMs` apart. The classic two-window formulation:
  * flag session starts with lag(), then a running sum of flags numbers
  * the sessions per key.
  *
  * Scale shape: ONE shuffle (hash by key for the window), state bounded
  * by a single key's events — the same partitioning both windows share,
  * so Catalyst plans exactly one Exchange. Ordering ties are broken by a
  * caller-named unique column so results are deterministic under any
  * partitioning (same-timestamp events would otherwise order randomly).
  * The streaming twin of this operator is Structured Streaming's
  * session_window aggregation; this is the batch/backfill path.
  */
object Sessionize {

  /** Event-level session assignment: adds `session_seq` (1-based per key,
    * in time order).
    */
  def assign(df: DataFrame, keyCol: String, tsCol: String, tieCol: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    df.withColumn(
        "_new",
        when(prev.isNull || col(tsCol) - prev > gapMs, 1L).otherwise(0L))
      .withColumn("session_seq", sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new")
  }

  /** Session-level rollup: one row per (key, session) with bounds and
    * event count. Adds one partial-aggregated shuffle on (key, session).
    */
  def stats(df: DataFrame, keyCol: String, tsCol: String, tieCol: String, gapMs: Long): DataFrame =
    assign(df, keyCol, tsCol, tieCol, gapMs)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration_ms"),
        count(lit(1)).as("n_events"))
}
