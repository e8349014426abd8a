package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling, split assignment, and source-weighted data
  * mixing for training-data pipelines (builder brief).
  *
  * Everything keys off a per-row md5 hash of (salt, id) — no RNG state,
  * no partition sensitivity: the decision for a row is a pure function of
  * its id, so samples are reproducible across runs, cluster sizes, task
  * retries, and engines (the DuckDB oracles replay the same md5
  * arithmetic). That stability is the property a 100 TB pipeline needs:
  * re-running a stage cannot silently change which rows were kept, and
  * growing the corpus never reshuffles previously-assigned splits
  * (per-id hashing, not per-run sorting or `TABLESAMPLE`).
  *
  * Scale shape: every operator here is a narrow map/filter — zero
  * shuffles, fully pushdown-friendly, codegen'd built-ins only.
  */
object Sampling {

  /** Uniform [0,1) from the first 4 md5 bytes of "salt:id" — the same
    * value as DuckDB's `('0x'||substr(md5(salt||':'||id),1,8))::BIGINT /
    * 4294967296.0`. Exactly representable (k/2³²), so comparisons
    * against rate thresholds are engine-independent.
    */
  def hashFraction(id: Column, salt: String): Column =
    conv(substring(md5(concat_ws(":", lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Deterministic Bernoulli(rate) sample: keep a row iff its hash
    * fraction falls below `rate`.
    */
  def sampleHash(df: DataFrame, idCol: String, rate: Double, salt: String): DataFrame =
    df.where(hashFraction(col(idCol), salt) < rate)

  /** Deterministic train/val/test (or any) split assignment: the hash
    * fraction lands in one of the cumulative-weight intervals. Weights
    * need not sum to 1 — they are normalized. Adding rows never moves an
    * existing row's split; changing the salt reshuffles all of them.
    */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      salt: String): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "split weights must be positive")
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    // last split takes the remainder — no fp gap at the top boundary
    val assigned = splits.zip(bounds).dropRight(1).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), els) => when(col("_frac") < hi, lit(name)).otherwise(els)
    }
    df.withColumn("_frac", hashFraction(col(idCol), salt))
      .withColumn("split", assigned)
      .drop("_frac")
  }

  /** Leakage-safe split assignment: near-duplicate cluster members are
    * hashed by their cluster's CANONICAL id instead of their own, so an
    * entire near-dup cluster lands in ONE split. Plain per-id splitting
    * puts ~20% of each near-dup pair across the train/test boundary
    * (weights 8/1/1) — textbook evaluation leakage: the model is scored
    * on paraphrases of its own training docs. `clusters` is
    * `Dedup.clusters` output ((doc_id, canonical_id, ...)); docs not in
    * any cluster (the overwhelming majority) fall back to their own id,
    * so their assignment is IDENTICAL to `assignSplit` at the same salt
    * — adding dedup-safety never reshuffles the singleton corpus.
    *
    * Scale: one left equi-join of the corpus against the cluster-member
    * table (pair-graph-sized — orders of magnitude smaller than the
    * corpus; broadcast when it fits), then the same narrow hash-interval
    * map as `assignSplit`. That join is the entire price of leakage
    * safety.
    */
  def assignSplitByCluster(
      df: DataFrame,
      idCol: String,
      clusters: DataFrame,
      splits: Seq[(String, Double)],
      salt: String): DataFrame = {
    val canon = clusters.select(col("doc_id").as(idCol), col("canonical_id"))
    val keyed = df
      .join(canon, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("canonical_id"), col(idCol)))
      .drop("canonical_id")
    assignSplit(keyed, "split_key", splits, salt)
  }

  /** Deterministic stratified sample / per-group quota: keep at most
    * `perGroup` rows from each group, chosen by md5-hash rank — the
    * "cap each domain/source at N documents" operator every pretraining
    * mixture applies against boilerplate-heavy domains. Hash-ranked
    * selection (not "first N in scan order") makes the kept set a pure
    * function of (salt, ids present), so it is stable across runs,
    * partitionings, and engines, and growing OTHER groups never changes
    * this group's picks. Emits `grp_rank` (1-based hash rank) so callers
    * can tighten the cap downstream without re-hashing.
    *
    * Scale: one hash-partitioned window per group — the same single
    * exchange a groupBy would pay; rank, don't sort-globally. Skewed
    * giant groups sort within their partitions (external sort, spills).
    */
  def sampleStratified(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      perGroup: Int,
      salt: String): DataFrame = {
    require(perGroup > 0, "perGroup must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), col(idCol))
    df.withColumn("grp_rank", row_number().over(w).cast("long"))
      .where(col("grp_rank") <= perGroup)
  }

  /** Exact integer square root (floor): seed from fp sqrt, then correct
    * the possible ±1 — exact for any non-negative Long. The seed is
    * clamped to isqrt(Long.MaxValue)−1 = 3037000498 so the (s0+1)²
    * correction probe cannot overflow a 64-bit lane near the top of the
    * domain (the true root is ≤ 3037000499, still reachable via the +1
    * step). The DuckDB oracle replays the same clamp-seed-correct CASE
    * arithmetic.
    */
  def isqrt(x: Column): Column = {
    val s0 = least(floor(sqrt(x.cast("double"))).cast("long"), lit(3037000498L))
    when((s0 + 1) * (s0 + 1) <= x, s0 + 1)
      .when(s0 * s0 > x, s0 - 1)
      .otherwise(s0)
  }

  /** Temperature-scaled source mixing (α = 1/2): per-source keep quotas
    * proportional to √count — the standard multilingual/multi-source
    * rebalancing (p_i ∝ c_i^α with temperature τ = 1/α = 2) that
    * upweights small sources a proportional sample would drown. Quota
    * n_g = targetTotal·√c_g DIV Σ√c (integer-exact via `isqrt`; a quota
    * above the source's size keeps the whole source). Rows are chosen by
    * the same md5-hash rank as `sampleStratified`, so picks are stable
    * across runs, partitionings, and corpus growth in OTHER sources.
    *
    * Scale shape: per-source counts are one partial-agg shuffle; the
    * quota table is group-cardinality-sized and broadcasts back; the
    * pick is one hash-partitioned window per source. Emits `grp_rank`
    * and `quota` so downstream stages can tighten without re-hashing.
    */
  def mixTemperature(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      targetTotal: Long,
      salt: String): DataFrame = {
    require(targetTotal > 0, "targetTotal must be positive")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_c"))
      .withColumn("_w", Sampling.isqrt(col("_c")))
    val tot = counts.agg(sum("_w").as("_sw"))
    val quotas = counts.crossJoin(broadcast(tot))
      .select(
        col(groupCol),
        // decimal intermediate: targetTotal·√c stays exact at any scale
        expr(s"CAST(CAST($targetTotal AS DECIMAL(38,0)) * _w DIV _sw AS BIGINT)").as("quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), col(idCol))
    df.withColumn("grp_rank", row_number().over(w).cast("long"))
      .join(broadcast(quotas), groupCol)
      .where(col("grp_rank") <= col("quota"))
  }

  /** Weighted sampling without replacement (sequential Poisson / Ohlsson
    * PPS): priority = u/w with u the exact dyadic md5 fraction and w the
    * row's weight; the n SMALLEST priorities win, so inclusion odds are
    * proportional to weight. One fp division per row on exactly-
    * representable operands (single IEEE op — engine-identical; the
    * rank-equivalent Efraimidis–Spirakis u^(1/w) form needs pow/log,
    * which are libm and NOT correctly rounded). Deterministic ties by
    * id. The top-n is an orderBy+limit — TakeOrderedAndProject's
    * distributed per-partition heaps at ANY n (a rank-filter window
    * would only rewrite to a group-limit below
    * spark.sql.optimizer.windowGroupLimitThreshold); ranks attach to
    * the ≤n survivors via a triangular broadcast self-join on the
    * (priority, id) keys — n² bounded by the parameter, not the data,
    * and the plan stays free of unpartitioned WindowExec nodes.
    * Weights must be positive and
    * non-null — a NULL priority would rank differently across engines
    * (NULLS FIRST vs LAST) and a non-positive one breaks the
    * proportional-inclusion contract, so bad weights raise instead.
    */
  def sampleWeighted(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      n: Int,
      salt: String): DataFrame = {
    require(n > 0, "n must be positive")
    val wOk = when(col(weightCol).isNotNull && col(weightCol) > 0, col(weightCol))
      .otherwise(raise_error(lit(s"sampleWeighted requires positive non-null $weightCol")))
    val top = df
      .withColumn("_prio", hashFraction(col(idCol), salt) / wOk)
      .orderBy(col("_prio"), col(idCol))
      .limit(n)
    val keys = top.select(col(idCol).as("_id"), col("_prio"))
    val ranks = keys.as("a")
      .join(
        broadcast(keys.as("b")),
        col("b._prio") < col("a._prio") ||
          (col("b._prio") === col("a._prio") && col("b._id") < col("a._id")),
        "left")
      .groupBy(col("a._id").as("_id"))
      .agg((count(col("b._id")) + 1).as("sample_rank"))
    top.join(broadcast(ranks), col(idCol) === col("_id"))
      .drop("_id", "_prio")
  }

  /** Source-weighted mixing: per-group sampling weight w ≥ 0 applied as
    * floor(w) guaranteed copies plus one more with probability frac(w)
    * (so w = 2.5 → 2 or 3 copies per row, expectation 2.5). w < 1 is
    * plain downsampling; w > 1 deterministic upsampling — together they
    * retarget a corpus's source mixture to training proportions in one
    * narrow pass (explode of a tiny per-row sequence; no shuffle, no RNG).
    * Emits a `copy` index (0-based) so downstream shuffles can
    * de-correlate repeated rows by (id, copy).
    */
  def mixWeighted(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      weights: Map[String, Double],
      defaultWeight: Double,
      salt: String): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(_ >= 0), "weights must be ≥ 0")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (g, wt)) =>
      when(col(groupCol) === g, lit(wt)).otherwise(acc)
    }
    val frac = hashFraction(col(idCol), salt)
    val copies = (floor(w) + when(frac < w - floor(w), 1).otherwise(0)).cast("int")
    df.withColumn("_copies", copies)
      .where(col("_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0), col("_copies") - 1)))
      .drop("_copies")
  }

  /** Token-budget curation — the corpus-assembly step after scoring:
    * per group (source/language), keep documents in descending-quality
    * order until the group's token budget is exhausted. The document that
    * CROSSES the budget line is still kept (standard "fill to at least
    * the budget" contract — dropping it would under-fill every group by
    * up to one document), everything after it is cut.
    *
    * One window per group ordered by (quality desc, id): the running
    * token total BEFORE each doc decides admission — admitted iff
    * `cum − tokens < budget`. Partitioned window (a group's docs per
    * frame), one hash shuffle, no global sort — the same shape at any
    * corpus size; ties on quality are broken by id so the kept set is
    * deterministic and incremental re-runs are stable.
    */
  def budgetCap(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      qualityCol: String,
      tokensCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(qualityCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w).cast("long"))
      .where(col("cum_tokens") - col(tokensCol) < budgetTokens)
  }

  /** Deterministic global shuffle into training shards — the last step
    * before a corpus feeds a trainer: break source/time locality so every
    * shard is an unbiased corpus sample, reproducibly (same salt → same
    * order, for restartable jobs and ablation parity).
    *
    * `shard` = first 4 md5 bytes of (salt, id) mod nShards — uniform and
    * independent of the shard count's data layout; `pos` = md5-order rank
    * WITHIN the shard. The only sort is per shard (a partitioned window),
    * so at 100 TB this is one hash shuffle + per-shard local sorts —
    * never a global order-by. Collision-free tie-break on id keeps the
    * permutation total.
    */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int, salt: String): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = conv(substring(md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(idCol))
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_h")
  }
}
