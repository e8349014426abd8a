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
    * Shape: ONE partial-aggregated shuffle to per-value counts, then the
    * global cumulative count via a DISTRIBUTED two-level prefix sum — no
    * single-partition exchange even when the column is near-unique and
    * the distinct table ≈ the data:
    *   1. Each distinct value gets a DETERMINISTIC partition id: a
    *      monotone double proxy of the value (identity for numerics,
    *      epoch for date/time, leading-7-bytes integer for strings —
    *      byte order = binary collation order), linearly split over the
    *      broadcast global [min, max] into `spark.sql.shuffle.partitions`
    *      contiguous ranges. Deterministic by construction — unlike
    *      `repartitionByRange`, whose per-RDD-id sampling seeds could
    *      assign DIFFERENT boundaries to the two consumers of this table
    *      unless exchange reuse happens to fire. Balance is heuristic
    *      (linear in proxy space), degrading to fewer effective
    *      partitions on pathological distributions — a perf, never a
    *      correctness, concern since the within-partition window sort
    *      spills.
    *   2. Cumulate WITHIN each pid under a window PARTITIONED by pid
    *      (executor-parallel, spill-safe); per-pid totals form a table of
    *      ≤ `spark.sql.shuffle.partitions`+2 rows (bounded by CONFIG, not
    *      data); each pid's offset = sum of totals of lower pids via a
    *      triangular broadcast join over that tiny table — deliberately a
    *      join, not a global window, so the plan contains no
    *      unpartitioned WindowExec at any cardinality.
    * Then a broadcast overlap-join of the n bucket rank-ranges against
    * the value spans. No global sort of the data itself, no collect:
    * bounds come out as a DataFrame of n rows, identical to the
    * single-window formulation (prefix sums of longs are exact, so the
    * partitioning cannot change the result). Bucket sizes are closed-form
    * (floor arithmetic), not counted — heavy values that straddle a
    * boundary split exactly as a rank-order cut would.
    */
  def rangeBounds(df: DataFrame, valueCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be positive")
    import org.apache.spark.sql.types._
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // monotone (non-strict) double proxy of the sort order; unsupported
    // types fall back to a constant = single cumulation partition (the
    // pre-r6 behavior, acceptable at the low cardinality such types carry)
    def proxy(name: String): Column = df.schema(valueCol).dataType match {
      case _: NumericType => col(name).cast(DoubleType)
      case TimestampType => col(name).cast(DoubleType)
      case DateType => col(name).cast(TimestampType).cast(DoubleType)
      case StringType =>
        expr(s"CAST(conv(hex(rpad(CAST(`$name` AS BINARY), 7, x'00')), 16, 10) AS DOUBLE)")
      case _ => lit(0.0)
    }
    val stats = df.agg(
      min(proxy(valueCol)).as("pmin"),
      max(proxy(valueCol)).as("pmax"),
      count(lit(1)).as("N"))
    val counts = df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(stats.select("pmin", "pmax")))
      .withColumn("_px", proxy("v"))
      // NaN sorts above every double in Spark ordering → top pid; NULL
      // sorts first → pid −1; NULL/NaN min−max edge cases all collapse to
      // monotone assignments (degraded balance, never a wrong rank)
      .withColumn(
        "pid",
        when(col("_px").isNaN, lit(p - 1)).otherwise(coalesce(
          when(col("pmax") <= col("pmin"), lit(0)).otherwise(least(
            lit(p - 1),
            greatest(lit(0), floor((col("_px") - col("pmin")) / (col("pmax") - col("pmin")) * p).cast(IntegerType)))),
          lit(-1))))
      .select(col("v"), col("cnt"), col("pid"))
    val localW = Window.partitionBy(col("pid")).orderBy(col("v"))
    val local = counts.withColumn(
      "local_cum",
      sum("cnt").over(localW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ptot = counts.groupBy(col("pid")).agg(sum("cnt").as("ptot"))
    // exclusive prefix over the config-bounded totals table — triangular
    // broadcast join keeps the plan free of unpartitioned windows
    val offsets = ptot.as("a")
      .join(broadcast(ptot.as("b")), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.ptot")), lit(0L)).as("offset"))
    val spans = local
      .join(broadcast(offsets), "pid")
      .withColumn("cum", col("local_cum") + col("offset"))
      .withColumn("cum_lo", col("cum") - col("cnt") + 1)
    val buckets = df.sparkSession.range(1, n + 1).toDF("bucket")
      .crossJoin(broadcast(stats.select("N")))
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
