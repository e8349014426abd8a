package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the table-maintenance operator every
  * long-lived 100 TB lake needs: streaming/CDC ingest leaves thousands of
  * tiny files per partition, and scan cost degrades with per-file
  * overhead (footer reads, task scheduling) until someone rewrites them
  * into target-size files.
  *
  * `plan` assigns each input file to an output bin using first-fit-in-
  * file-order within each table partition: running-total bytes DIV the
  * target size. One window per table partition (files-per-partition rows,
  * thousands at most — bounded regardless of table size), so the planner
  * itself is partition-parallel with a single hash shuffle on the
  * partition key; no global state, no driver loop. The bin id is
  * deterministic in (partition, file order) — replayable for idempotent
  * re-compaction after a failed run.
  *
  * `stats` rolls the plan up per bin for the executor that will rewrite
  * it: file count, total bytes, and fill ratio vs target — the skip list
  * (bins with one file at >= the target fill need no rewrite) falls out
  * of a filter.
  */
object Compaction {

  /** Assign output bins. `files` must have one row per file with
    * `partCol` (table-partition key), `fileCol` (orderable file id) and
    * `bytesCol`. An oversized file (> targetBytes) joins whatever bin its
    * pre-file running total falls in (possibly with earlier small files),
    * but no LATER file ever shares it: the running total jumps past at
    * least one full boundary, so the next file starts a fresh bin.
    */
  def plan(files: DataFrame, partCol: String, fileCol: String, bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .select(col(partCol), col(fileCol), col(bytesCol).cast("long").as("bytes"))
      .withColumn("_cum", sum(col("bytes")).over(w))
      // bin by the PRE-file running total so a file never splits a bin:
      // first-fit = floor((cum - bytes) / target)
      .withColumn("bin", expr(s"(_cum - bytes) DIV $targetBytes"))
      .drop("_cum")
  }

  /** Per-bin rollup of a `plan` result: what each rewrite task reads. */
  def stats(planned: DataFrame, partCol: String, targetBytes: Long): DataFrame =
    planned
      .groupBy(col(partCol), col("bin"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("bytes")).as("total_bytes"),
        min(col("bytes")).as("min_bytes"),
        max(col("bytes")).as("max_bytes"))
      .withColumn("fill_pct", expr(s"(total_bytes * 100) DIV $targetBytes"))
      .withColumn("needs_rewrite", col("n_files") > 1)
}
