package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
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
  def join(points: DataFrame, baseline: DataFrame): DataFrame =
    join(points, baseline, Backward, Long.MaxValue)

  val Backward = "backward"
  val Forward = "forward"
  val Nearest = "nearest"

  /** Directional/tolerant as-of join — the full `merge_asof` surface:
    *
    *  - `backward` (default): latest baseline at or before the point
    *    (DuckDB `ASOF JOIN ... ON p.ts >= b.ts`).
    *  - `forward`: earliest baseline at or after the point
    *    (`ON p.ts <= b.ts`).
    *  - `nearest`: the closer of the two; ties go BACKWARD (the
    *    documented rule — state that already happened beats state that
    *    hasn't).
    *
    * `toleranceMs` bounds the match gap. Candidates are filtered by
    * tolerance BEFORE the nearest choice, so a point whose closer side
    * is out of tolerance still matches the eligible farther side —
    * the useful contract for sparse baselines (pandas instead drops the
    * row; the difference is documented here, not hidden). Unmatched
    * points are dropped (inner), matching the base form.
    *
    * Same scale shape for every direction: one hash partition by key +
    * sort; `nearest` adds a second window ordering over the SAME
    * exchange (two sorts, zero extra shuffles).
    */
  def join(
      points: DataFrame,
      baseline: DataFrame,
      direction: String,
      toleranceMs: Long): DataFrame = {
    require(Set(Backward, Forward, Nearest).contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(toleranceMs > 0, s"toleranceMs must be positive, got $toleranceMs")
    val p = points.select(
      col("seriesKey"), col("tsMs"), col("value"),
      lit(null).cast("double").as("_b"), lit(null).cast("long").as("_bts"),
      lit(1).as("_side"))
    val b = baseline.select(
      col("seriesKey"), col("tsMs"), lit(null).cast("double").as("value"),
      col("baseline").as("_b"), col("tsMs").cast("long").as("_bts"),
      lit(0).as("_side"))
    val u = p.unionByName(b)
    // backward: baseline sorts BEFORE the point at equal ts → inclusive
    val wB = Window.partitionBy("seriesKey")
      .orderBy(col("tsMs").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: evaluated as a REVERSED running frame. The natural
    // [currentRow, unboundedFollowing] formulation is O(n²) per series in
    // Spark (UnboundedFollowingWindowFunctionFrame re-aggregates from
    // each row to the partition end — a 600k-row hot key never finished
    // in the 10x skew probe); ordering ts DESC with a running
    // [unboundedPreceding, currentRow] last() is the same semantics at
    // O(n). At equal ts the baseline sorts BEFORE the point in the
    // reversed order (_side asc) → inclusive, exactly as before.
    val wF = Window.partitionBy("seriesKey")
      .orderBy(col("tsMs").desc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def inTol(c: Column, gap: Column): Column =
      when(gap <= toleranceMs, c)
    // value and timestamp ride ONE struct through the carry window: two
    // separate last()/first() calls could pair a value with another
    // row's timestamp when the baseline column contains NULLs (the value
    // carry skips the NULL-valued row, the timestamp carry does not —
    // wrong tolerance gap). The when() wrapper nulls the WHOLE struct on
    // NULL-valued baseline rows, so ignoreNulls skips them as one unit.
    val bPair = when(col("_b").isNotNull, struct(col("_bts"), col("_b")))
    val joined = direction match {
      case Backward =>
        u.withColumn("_sb", last(bPair, ignoreNulls = true).over(wB))
          .withColumn("_vb", col("_sb").getField("_b"))
          .withColumn("_tb", col("_sb").getField("_bts"))
          .withColumn("baseline", inTol(col("_vb"), col("tsMs") - col("_tb")))
      case Forward =>
        u.withColumn("_sf", last(bPair, ignoreNulls = true).over(wF))
          .withColumn("_vf", col("_sf").getField("_b"))
          .withColumn("_tf", col("_sf").getField("_bts"))
          .withColumn("baseline", inTol(col("_vf"), col("_tf") - col("tsMs")))
      case Nearest =>
        u.withColumn("_sb", last(bPair, ignoreNulls = true).over(wB))
          .withColumn("_vb", col("_sb").getField("_b"))
          .withColumn("_tb", col("_sb").getField("_bts"))
          .withColumn("_sf", last(bPair, ignoreNulls = true).over(wF))
          .withColumn("_vf", col("_sf").getField("_b"))
          .withColumn("_tf", col("_sf").getField("_bts"))
          .withColumn("_gb", when(col("_vb").isNotNull, col("tsMs") - col("_tb")))
          .withColumn("_gf", when(col("_vf").isNotNull, col("_tf") - col("tsMs")))
          // tolerance first, then the choice; ties backward
          .withColumn("_eb", inTol(col("_vb"), col("_gb")))
          .withColumn("_ef", inTol(col("_vf"), col("_gf")))
          .withColumn("baseline",
            when(col("_eb").isNotNull &&
              (col("_ef").isNull || col("_gb") <= col("_gf")), col("_eb"))
              .otherwise(col("_ef")))
    }
    joined
      .where(col("_side") === 1 && col("baseline").isNotNull)
      .select("seriesKey", "tsMs", "value", "baseline")
  }
}
