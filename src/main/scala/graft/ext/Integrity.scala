package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-QA operators: constraint checking and snapshot reconciliation —
  * the validation layer between a 100 TB ingest and the queries that
  * trust it.
  */
object Integrity {

  /** Referential-integrity report for a child→parent key relationship:
    * one row per check with its violation count.
    *
    *   - `null_fk`   — child rows with a NULL key (can never join)
    *   - `orphan_fk` — child rows whose key has no parent (left anti join)
    *   - `dup_pk`    — total rows belonging to duplicated parent keys
    *                   (a key with 2 rows reports 2 — the join fan-out
    *                   multiplier, not the distinct offending-key count)
    *
    * Scale shape: three independent jobs, each at most one hash shuffle —
    * the orphan check is a LEFT ANTI join on the key (broadcast when the
    * parent key set is small), dup_pk a partial-aggregated groupBy,
    * null_fk a scan-side count. No driver state; the report is 3 rows.
    */
  def referentialReport(
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String): DataFrame = {
    val spark = child.sparkSession
    import spark.implicits._
    val nullFk = child.where(col(childKey).isNull)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("null_fk").as("check"), col("n_violations"))
    // DataFrame-scoped references: with the common childKey == parentKey
    // naming (custkey/custkey) an unscoped col() is ambiguous, and a
    // renamed magic column could itself collide with a child column.
    val childNn = child.where(col(childKey).isNotNull)
    val parentKeys = parent.select(col(parentKey)).distinct()
    val orphan = childNn
      .join(parentKeys, childNn(childKey) === parentKeys(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orphan_fk").as("check"), col("n_violations"))
    val dupPk = parent.groupBy(col(parentKey)).agg(count(lit(1)).as("_c"))
      .where(col("_c") > 1)
      .agg(coalesce(sum(col("_c")), lit(0L)).as("n_violations"))
      .select(lit("dup_pk").as("check"), col("n_violations"))
    nullFk.unionByName(orphan).unionByName(dupPk)
  }

  /** Functional-dependency violation report: rows of `determinant`
    * values that map to MORE than one `dependent` value — the check
    * behind "doc_id determines source", "user determines signup
    * cohort", or any other invariant an ingest assumes and a bad join
    * or merge silently breaks. Emits one row per violating determinant
    * with its distinct dependent count and total row mass.
    *
    * Scale shape: one partial-aggregated groupBy on the determinant
    * (count + countDistinct via Spark's standard Expand rewrite, 2×
    * input to one exchange); output is only the violators.
    */
  def fdViolations(df: DataFrame, determinant: String, dependent: String): DataFrame =
    df.where(col(determinant).isNotNull)
      .groupBy(col(determinant))
      .agg(
        countDistinct(col(dependent)).as("n_dependent_values"),
        count(lit(1)).as("n_rows"))
      .where(col("n_dependent_values") > 1)

  /** Snapshot reconciliation: classify every key across two versions of a
    * table as added / removed / changed / unchanged, with the list of
    * differing columns for `changed` rows. The validation twin of
    * `Merge.applyChangelog` — applying a changelog and diffing the result
    * against the base must reproduce the changelog's effect.
    *
    * One full-outer join on the key (single hash shuffle; null-safe
    * column compares), no driver state. Emits only non-`unchanged` rows
    * by default — at 100 TB the interesting output is the delta, not the
    * 99.9% that matched.
    */
  def snapshotDiff(
      before: DataFrame,
      after: DataFrame,
      keyCol: String,
      compareCols: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    require(!compareCols.contains(keyCol),
      s"keyCol '$keyCol' must not be in compareCols (it is the join key; listing it would duplicate b_/a_ columns)")
    val b = before.select((keyCol +: compareCols).map(c => col(c).as(s"b_$c")): _*)
    val a = after.select((keyCol +: compareCols).map(c => col(c).as(s"a_$c")): _*)
    val joined = b.join(a, col(s"b_$keyCol") === col(s"a_$keyCol"), "full_outer")
    val diffs = compareCols.map(c => when(!(col(s"b_$c") <=> col(s"a_$c")), c))
    val changedCols = concat_ws(",", array(diffs: _*))
    val change = when(col(s"b_$keyCol").isNull, "added")
      .when(col(s"a_$keyCol").isNull, "removed")
      .when(changedCols =!= "", "changed")
      .otherwise("unchanged")
    val out = joined.select(
      coalesce(col(s"b_$keyCol"), col(s"a_$keyCol")).as(keyCol),
      change.as("change"),
      when(change === "changed", changedCols).otherwise(lit("")).as("changed_cols"))
    if (includeUnchanged) out else out.where(col("change") =!= "unchanged")
  }
}
