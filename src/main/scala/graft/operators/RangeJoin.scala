package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized interval (range) join — the operator Spark lacks natively:
  * `point.ts BETWEEN interval.start AND interval.end` planned as a plain
  * theta join degrades to BroadcastNestedLoopJoin (O(|points|·|intervals|)
  * comparisons) or an outright cartesian. The classic scale rewrite maps
  * both sides onto fixed-width time buckets: each point lands in exactly
  * one bucket, each interval is replicated across the buckets it covers,
  * and the join becomes an EQUI-join on (keys…, bucket) + an exact
  * containment filter. Each point meets only the intervals sharing its
  * bucket — at 100 TB that is a shuffled/broadcast hash join with
  * per-bucket locality instead of an all-pairs scan.
  *
  * Tuning: interval replication is 1 + span/bucketMs rows, and a bucket's
  * candidate set is the intervals overlapping it — pick bucketMs near the
  * typical interval span (wider buckets → fewer replicas, more false
  * candidates; narrower → the reverse). Degenerate intervals with
  * end < start are dropped (they contain nothing, and Spark's sequence()
  * would otherwise iterate backwards).
  */
object RangeJoin {

  def intervalJoin(
      points: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      keyCols: Seq[String],
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    require(
      !(points.columns ++ intervals.columns).contains("_b"),
      "intervalJoin reserves column name _b; rename it on the input")
    val p = points.withColumn("_b", expr(s"CAST($tsCol DIV $bucketMs AS BIGINT)"))
    val iv = intervals
      .where(col(endCol) >= col(startCol))
      .withColumn(
        "_b",
        explode(sequence(
          expr(s"CAST($startCol DIV $bucketMs AS BIGINT)"),
          expr(s"CAST($endCol DIV $bucketMs AS BIGINT)"))))
    p.join(iv, keyCols :+ "_b")
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_b")
  }

  /** Bucketized interval–interval OVERLAP join: pairs (a, b) with
    * `a.start ≤ b.end AND b.start ≤ a.end` (closed intervals), planned as
    * an equi-join instead of a nested loop. Both sides replicate across
    * the buckets they cover; to emit each overlapping pair EXACTLY ONCE
    * despite multi-bucket co-occurrence, a pair only matches in the
    * bucket of `greatest(a.start, b.start)` — the first bucket where both
    * are present (the standard dedup trick, a pure filter: no distinct,
    * no post-shuffle dedup pass).
    *
    * Column-name hygiene: caller supplies disjoint output column sets via
    * `leftCols`/`rightCols` projections being distinct; start/end columns
    * of the two sides must be named differently (enforced).
    */
  def overlapJoin(
      left: DataFrame,
      lStartCol: String,
      lEndCol: String,
      right: DataFrame,
      rStartCol: String,
      rEndCol: String,
      keyCols: Seq[String],
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    require(
      Set(lStartCol, lEndCol, rStartCol, rEndCol).size == 4,
      "left and right interval columns must have distinct names")
    require(
      !(left.columns ++ right.columns).contains("_b"),
      "overlapJoin reserves column name _b; rename it on the input")
    val keyed = keyCols.toSet
    val overlap = (left.columns.toSet - "_b" -- keyed).intersect(right.columns.toSet -- keyed)
    require(overlap.isEmpty, s"non-key columns shared by both sides: ${overlap.mkString(", ")}")
    def burst(df: DataFrame, s: String, e: String) = df
      .where(col(e) >= col(s))
      .withColumn(
        "_b",
        explode(sequence(
          expr(s"CAST($s DIV $bucketMs AS BIGINT)"),
          expr(s"CAST($e DIV $bucketMs AS BIGINT)"))))
    burst(left, lStartCol, lEndCol)
      .join(burst(right, rStartCol, rEndCol), keyCols :+ "_b")
      .where(
        col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol) &&
          col("_b") === expr(s"CAST(greatest($lStartCol, $rStartCol) DIV $bucketMs AS BIGINT)"))
      .drop("_b")
  }
}
