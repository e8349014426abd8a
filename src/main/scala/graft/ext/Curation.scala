package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation provenance — the per-document DROP LEDGER a production
  * pipeline owes its users: not just "the corpus shrank from N to M"
  * (the report row `curation_pipeline` already emits) but, for EVERY
  * input document, which gates it passed, which gate dropped it first,
  * and where the survivors landed. Without this row a pipeline is
  * unauditable: a missing document is indistinguishable from a lost one,
  * and gate regressions hide inside aggregate counts.
  */
object Curation {

  /** One row per input document, composing already-computed stage
    * outputs (this operator JOINS verdicts, it never recomputes them —
    * each gate stays the single source of truth for its own decision):
    *
    *  - `quality_keep` from a quality gate frame `(idCol, keep)`;
    *    documents ABSENT from the gate output (e.g. zero tokens → no
    *    score) default to `false` — no signal means drop, and the
    *    ledger makes that visible instead of losing the row.
    *  - `canonical_id` / `is_dup` from a near-dup cluster frame
    *    `(doc_id, canonical_id)` ([[Dedup.clusters]] shape; docs
    *    outside any cluster are their own canonical). A doc is a
    *    duplicate when it is not its cluster's canonical — the keep-one
    *    policy every dedup stage applies.
    *  - `contaminated` from a frame of contaminated ids (e.g.
    *    [[Dedup.contaminationPairs]]' `train_id` side, deduplicated
    *    here).
    *  - `status`: the FIRST failing gate in pipeline order
    *    `quality → duplicate → contaminated`, else `kept`. Individual
    *    verdict columns are all still present — an auditor sees every
    *    reason, not just the first.
    *  - `split`: the leakage-safe assignment for kept docs (hashed by
    *    canonical id so a near-dup cluster can never straddle a
    *    boundary — [[Sampling.assignSplitByCluster]]'s contract), null
    *    for dropped docs.
    *
    * 100 TB shape: three left equi-joins on the id the corpus is
    * already partitioned by (gate outputs are corpus-keyed or smaller)
    * plus one hash expression — no windows, no collects, no extra
    * corpus scans.
    */
  def ledger(
      docs: DataFrame,
      idCol: String,
      quality: DataFrame,
      clusters: DataFrame,
      contaminatedIds: DataFrame,
      splits: Seq[(String, Double)],
      salt: String): DataFrame = {
    val q = quality.select(col(idCol), col("keep").as("quality_keep"))
    val c = clusters.select(col("doc_id").as(idCol), col("canonical_id"))
    val k = contaminatedIds.select(col(idCol)).distinct()
      .withColumn("contaminated", lit(true))
    val verdicts = docs.select(col(idCol))
      .join(q, Seq(idCol), "left")
      .join(c, Seq(idCol), "left")
      .join(k, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("quality_keep"), lit(false)).as("quality_keep"),
        coalesce(col("canonical_id"), col(idCol)).as("canonical_id"),
        (coalesce(col("canonical_id"), col(idCol)) =!= col(idCol)).as("is_dup"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
      .withColumn("status", statusExpr)
    Sampling.assignSplit(verdicts, "canonical_id", splits, salt)
      .withColumn("split", when(col("status") === "kept", col("split")))
  }

  private def statusExpr: Column =
    when(!col("quality_keep"), lit("quality"))
      .when(col("is_dup"), lit("duplicate"))
      .when(col("contaminated"), lit("contaminated"))
      .otherwise(lit("kept"))
}
