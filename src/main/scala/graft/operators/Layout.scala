package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Write-side data-layout operators: Z-order (Morton) clustering keys and
  * exact range-partition bounds — the two primitives behind multi-
  * dimensional file skipping and balanced global sorts at 100 TB.
  * Sorting a table by `z_value` before writing parquet co-locates rows
  * that are close in BOTH dimensions, so min/max footer stats prune
  * two-predicate scans; `rangeBounds` is the boundary table a range
  * partitioner (or a manifest-based writer) needs to cut balanced files.
  */
object Layout {

  /** Morton/Z-order interleave of two already-quantized coordinates:
    * bit b of `x` lands at position 2b, bit b of `y` at 2b+1. Pure
    * codegen'd shift/mask arithmetic (2·bits terms), no UDF. Inputs must
    * lie in [0, 2^bits); out-of-range raises rather than silently
    * wrapping (a wrapped key would SILENTLY destroy clustering).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    // the 2-D layout (bit b of x at 2b, of y at 2b+1) is exactly the
    // N-dim round-robin at N = 2 — one interleave implementation
    zValueN(Seq(x, y), bits)
  }

  /** N-dimensional Morton interleave: bit b of column i lands at
    * position b·N + i (round-robin) — the general form of `zValue` for
    * layouts clustered on three or more columns. Same contract: inputs
    * already quantized to [0, 2^bits), out-of-range raises; N·bits ≤ 63.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "zValueN needs at least two columns")
    require(bits >= 1 && cols.size * bits <= 63, s"${cols.size} cols × $bits bits exceeds a Long")
    val n = cols.size
    val max = 1L << bits
    val z = (for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)).reduce(_ + _)
    val inRange = cols.map(c => c >= 0 && c < max).reduce(_ && _)
    when(inRange, z)
      .otherwise(raise_error(lit(s"Layout.zValueN input outside [0, $max)")))
  }

  /** Z-order clustering key + file/bucket assignment for a two-column
    * layout: adds `z_value` and `z_bucket` (the top log2(buckets) bits of
    * the interleave, i.e. the quad-tree tile the row belongs to). Writing
    * one file per `z_bucket`, sorted by `z_value` within, gives footer
    * min/max ranges that prune on EITHER column — the standard lakehouse
    * OPTIMIZE ZORDER shape, expressed as a plain deterministic column so
    * it survives any engine or writer.
    */
  def zorder(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      buckets: Int): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0, "buckets must be a power of two >= 2")
    val lg = 63 - java.lang.Long.numberOfLeadingZeros(buckets.toLong)
    require(lg <= 2L * bits, s"buckets=$buckets needs more than the ${2 * bits} z-bits")
    df.withColumn("z_value", zValue(col(xCol), col(yCol), bits))
      .withColumn("z_bucket", shiftright(col("z_value"), (2 * bits - lg).toInt))
  }

  /** Exact range-partition bounds: cut an ordered column into `n` buckets
    * of near-equal row counts (sizes differ by at most 1 — rank r goes to
    * bucket (r−1)·n DIV N + 1) and report each bucket's [lo, hi] value
    * range and size. This is the boundary table a balanced global sort /
    * range-partitioned write needs.
    *
    * Shape: ONE partial-aggregated shuffle to per-value counts, a
    * cumulative window over the DISTINCT-value table (orders of magnitude
    * smaller than the rows; at extreme distinct cardinality sample first
    * — Spark's own RangePartitioner does), then a broadcast overlap-join
    * of the n bucket rank-ranges against the value spans. No global sort
    * of the data itself, no collect: bounds come out as a DataFrame of n
    * rows. Bucket sizes are closed-form (floor arithmetic), not counted —
    * heavy values that straddle a boundary split exactly as a rank-order
    * cut would.
    */
  def rangeBounds(df: DataFrame, valueCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be positive")
    val counts = df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("v"))
    val spans = counts
      .withColumn("cum", sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_lo", col("cum") - col("cnt") + 1)
    val total = counts.agg(sum("cnt").as("N"))
    val buckets = df.sparkSession.range(1, n + 1).toDF("bucket")
      .crossJoin(broadcast(total))
      // bucket b covers ranks [ (b-1)·N DIV n + 1 , b·N DIV n ]
      .withColumn("r_lo", expr(s"(bucket - 1) * N DIV $n + 1"))
      .withColumn("r_hi", expr(s"bucket * N DIV $n"))
      .where(col("r_hi") >= col("r_lo"))
    spans
      .join(broadcast(buckets), col("cum_lo") <= col("r_hi") && col("cum") >= col("r_lo"))
      .groupBy(col("bucket"))
      .agg(
        min(col("v")).as("lo"),
        max(col("v")).as("hi"),
        min(col("r_hi") - col("r_lo") + 1).as("n_rows"))
  }
}
