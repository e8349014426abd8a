package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass per-column data profiling — the "what is in this table"
  * operator every ingest pipeline runs before anything else: row/null
  * counts, exact distinct cardinality, min/max, and mean value-
  * representation length for every requested column, from a SINGLE scan.
  *
  * All per-column aggregates land in one `agg(...)` call, so Catalyst
  * compiles one job; the multiple `countDistinct`s are rewritten through
  * one Expand (cols× the aggregation input, standard Spark
  * distinct-rewrite). That trade is right up to mid scale; at the 100 TB
  * end swap the exact distinct for `Sketches.hllRegisters`/`hllEstimate`
  * per column — the rest of the profile is plain partial-aggregated
  * min/max/sum/count and never shuffles more than one row per aggregate.
  * The wide one-row result is then exploded to the long
  * (col_name, stats…) shape — driver-side cost: one row.
  *
  * min/max are computed on the NATIVE column type (so numeric columns
  * order numerically, not lexically) and cast to string only for the
  * uniform output schema.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"),
        sum(length(col(c).cast("string"))).as(s"_len_$c"))
    } :+ count(lit(1)).as("_rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("_rows").as("n_rows"),
        (col("_rows") - col(s"_nn_$c")).as("n_nulls"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").as("min_str"),
        col(s"_max_$c").as("max_str"),
        // 4-decimal half-up in the integer domain (lengths and counts
        // are non-negative) — fp round of an integer-ratio mean is the
        // engine-divergent class scrubbed from every other average here
        (expr(s"(CAST(_len_$c AS DECIMAL(38,0)) * 20000 + _nn_$c) DIV (2 * _nn_$c)") / 10000.0)
          .as("avg_repr_len"))
    }
    wide.select(explode(array(entries: _*)).as("_p")).select("_p.*")
  }

  /** The 100 TB distinct-count path the `profile` scaladoc promises: per-
    * column cardinality via `Sketches.hllRegisters`/`hllEstimate` instead
    * of the exact Expand-rewritten `countDistinct`. ONE scan emits a
    * (col_name, value) row per non-null cell (the same cols× Expand shape
    * as the exact profiler), then the register aggregation shuffles at
    * most cols · 2^p one-long rows — constant size in the row count,
    * mergeable across table shards by union+max. Values hash through
    * their string representation so every column type shares one
    * register layout. Output: `hllEstimate`'s
    * (col_name, n_zero_buckets, sum_fp, est_distinct).
    */
  def profileSketch(df: DataFrame, cols: Seq[String], p: Int = 12): DataFrame = {
    require(cols.nonEmpty, "profileSketch needs at least one column")
    val stacked = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("value"))): _*)).as("_e"))
      .select("_e.*")
      .where(col("value").isNotNull)
    Sketches.hllEstimate(
      Sketches.hllRegisters(stacked, "col_name", "value", p), "col_name", p)
  }
}
