package graft.functions

import graft.ext.{Dedup, Sketches, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import graft.bridge.SqlBridge

/** SQL surface for the flagship extension operators — table-valued
  * functions so a SQL-only user can run the dedup/text pipeline from
  * pure SQL strings, the same way `exp_avg_fold`/`derivative_fold`
  * expose the detectors:
  *
  *   SELECT * FROM minhash_pairs('docs_view')        -- τ default 0.5
  *   SELECT * FROM minhash_pairs('docs_view', 0.3)   -- explicit τ
  *   SELECT * FROM tfidf_topk('docs_view', 5)        -- top-5 keywords/doc
  *
  * The argument names a table/view exposing `(doc_id, text)` (the
  * documents convention, mirroring the fold TVFs' fixed
  * seriesKey/tsMs/value contract). Each builder delegates to the SAME
  * DataFrame implementation as the Scala API (`Dedup.minhashLshPairs`,
  * `TextAnalysis.tfidfTopK`) and returns its analyzed plan, so the SQL
  * path inherits the exact operator — banding caps, broadcast
  * choices, fixed-point idf — with zero drift between surfaces.
  *
  * Unlike the fold TVFs (which stay unresolved until analysis), these
  * builders resolve the named table via the ACTIVE session at analysis
  * time — required because the underlying operators are eager about
  * their own materialization points (the MinHash signature persist).
  * Consequence: the relation must exist when the query is ANALYZED, and
  * the signature-table persist runs then too.
  */
object ExtTableFunctions {

  val MinhashPairsName = "minhash_pairs"
  val TfidfTopKName = "tfidf_topk"
  val QualityLrName = "quality_lr"
  val KmvOverlapName = "kmv_overlap"
  val PpjoinPairsName = "ppjoin_pairs"
  val DedupClustersName = "dedup_clusters"
  val DedupExciseName = "dedup_excise"
  val TrianglesName = "triangles"
  val ContainmentPairsName = "containment_pairs"
  val ExactSubstringName = "exact_substring_excise"
  val FuzzyDecontamName = "fuzzy_decontaminate"

  /** Session-scoped artifact cache for the PAIR-GRAPH TVFs (minhash /
    * ppjoin) — the builders whose whole signature→candidate→verify
    * pipeline would otherwise re-run on EVERY SQL query (and, because
    * Spark inlines duplicate CTE references, can re-run twice inside ONE
    * query): the first call materializes the pair table to parquet, every
    * later call — Scala or SQL — reads the file, the same amortization
    * `ExtQueries.artifactFor` gives Scala callers. Keyed by
    * (function, table name, params, applicationId): artifacts are
    * immutable snapshots, so a pipeline that mutates the underlying view
    * mid-session must register a fresh view name (the standard artifact
    * contract). computeIfAbsent builds at most once under concurrency;
    * paths are appId-suffixed and deleted on JVM exit.
    */
  private val artifactCache =
    new java.util.concurrent.ConcurrentHashMap[String, LogicalPlan]

  private def cachedPlan(key: String)(build: => org.apache.spark.sql.DataFrame): LogicalPlan =
    cachedPlanScoped(key)(write => write(build))

  /** `cachedPlan` for builders whose kernel pins internal caches: `build`
    * receives the parquet writer and runs INSIDE the kernel's release
    * scope (e.g. `Dedup.withPpjoinPairs`), so the pinned storage is freed
    * the moment the artifact write lands instead of surviving the session.
    */
  private def cachedPlanScoped(key: String)(
      build: (org.apache.spark.sql.DataFrame => Unit) => Unit): LogicalPlan =
    artifactCache.computeIfAbsent(key, _ => {
      val spark = SparkSession.active
      // md5 of the full key, not key.hashCode: a 32-bit collision between
      // two live keys would make the second overwrite-write the first
      // key's parquet while its cached plan still points there — silent
      // wrong rows. 128 bits removes the case instead of betting on it.
      val keyHex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      val path = new java.io.File(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"),
        s"graft_tvf_${keyHex}_${spark.sparkContext.applicationId}").toString
      build(df => df.write.mode("overwrite").parquet(path))
      val root = new java.io.File(path)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(root)
      }))
      SqlBridge.analyzedPlan(spark.read.parquet(path))
    })

  /** `minhash_pairs(table[, tau])` — MinHash-LSH near-dup pairs
    * `(da, db, jaccard)` over a `(doc_id, text)` relation.
    */
  def minhashPairsBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.length <= 2, s"usage: $MinhashPairsName(table[, tau])")
    val table = FoldTableFunctions.stringArg(MinhashPairsName, args, 0)
    val tau = FoldTableFunctions.doubleArg(MinhashPairsName, args, 1, 0.5)
    val spark = SparkSession.active
    cachedPlan(s"$MinhashPairsName:$table:$tau:${spark.sparkContext.applicationId}") {
      Dedup.minhashLshPairs(spark.table(table), "doc_id", "text", tau = tau)
    }
  }

  /** `tfidf_topk(table, k)` — per-doc top-k tf·idf keywords
    * `(doc_id, rank, wd, tf, score_fp)` over a `(doc_id, text)` relation.
    */
  def tfidfTopKBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2, s"usage: $TfidfTopKName(table, k)")
    val table = FoldTableFunctions.stringArg(TfidfTopKName, args, 0)
    val k = FoldTableFunctions.doubleArg(TfidfTopKName, args, 1, Double.NaN).toInt
    val spark = SparkSession.active
    SqlBridge.analyzedPlan(
      TextAnalysis.tfidfTopK(spark.table(table), "doc_id", "text", k))
  }

  /** `quality_lr(table)` — fasttext-shaped hashed-bag-of-words quality
    * scores `(doc_id, n_tokens, score, keep)` over a `(doc_id, text)`
    * relation.
    */
  def qualityLrBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1, s"usage: $QualityLrName(table)")
    val table = FoldTableFunctions.stringArg(QualityLrName, args, 0)
    val spark = SparkSession.active
    SqlBridge.analyzedPlan(TextAnalysis.qualityLr(spark.table(table), "doc_id", "text"))
  }

  /** `kmv_overlap(table[, k])` — pairwise cross-source KMV token overlap
    * `(ga, gb, jaccard_est, union_est)` over a `(source, text)` relation.
    */
  def kmvOverlapBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.length <= 2, s"usage: $KmvOverlapName(table[, k])")
    val table = FoldTableFunctions.stringArg(KmvOverlapName, args, 0)
    val k = FoldTableFunctions.doubleArg(KmvOverlapName, args, 1, 128.0).toInt
    val spark = SparkSession.active
    SqlBridge.analyzedPlan(
      Sketches.kmvOverlap(Sketches.kmvTokenSketch(spark.table(table), "source", "text", k), "source", k))
  }

  /** `dedup_clusters(table[, tau])` — duplicate-cluster assembly from
    * SQL: MinHash-LSH pairs at τ, then connected components (min-label
    * propagation with path halving), returning `(doc_id, canonical_id,
    * cluster_size)` — so a SQL-only user gets the thing a dedup pipeline
    * actually consumes (which doc to keep per group), not just the raw
    * pair graph `minhash_pairs` already exposes. Routed through the
    * artifact cache: the signature pipeline AND the label-propagation
    * fixpoint run once per (table, τ); every later SQL query reads the
    * parquet artifact.
    */
  def dedupClustersBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.length <= 2, s"usage: $DedupClustersName(table[, tau])")
    val table = FoldTableFunctions.stringArg(DedupClustersName, args, 0)
    val tau = FoldTableFunctions.doubleArg(DedupClustersName, args, 1, 0.5)
    val spark = SparkSession.active
    cachedPlan(s"$DedupClustersName:$table:$tau:${spark.sparkContext.applicationId}") {
      Dedup.clusters(Dedup.minhashLshPairs(spark.table(table), "doc_id", "text", tau = tau))
    }
  }

  /** `dedup_excise(table)` — corpus-wide duplicated-span excision from
    * SQL: CDC chunking, keep-first ownership election, and clean-text
    * reconstruction (`Dedup.exciseDuplicateChunks`), returning one row
    * per input document `(doc_id, n_chunks, n_kept, clean_text)` — the
    * substring-level dedup OUTPUT a SQL-only pipeline ships, not just
    * the chunk table. Routed through the artifact cache: the chunk +
    * election pipeline runs once per table; later SQL reads parquet.
    */
  def dedupExciseBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1, s"usage: $DedupExciseName(table)")
    val table = FoldTableFunctions.stringArg(DedupExciseName, args, 0)
    val spark = SparkSession.active
    cachedPlan(s"$DedupExciseName:$table:${spark.sparkContext.applicationId}") {
      Dedup.exciseDuplicateChunks(spark.table(table), "doc_id", "text")
    }
  }

  /** `ppjoin_pairs(table[, tau])` — EXACT prefix-filtered Jaccard pairs
    * `(da, db, jaccard)` over a `(doc_id, text)` relation.
    */
  def ppjoinPairsBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.length <= 2, s"usage: $PpjoinPairsName(table[, tau])")
    val table = FoldTableFunctions.stringArg(PpjoinPairsName, args, 0)
    val tau = FoldTableFunctions.doubleArg(PpjoinPairsName, args, 1, 0.5)
    val spark = SparkSession.active
    cachedPlanScoped(s"$PpjoinPairsName:$table:$tau:${spark.sparkContext.applicationId}") { write =>
      Dedup.withPpjoinPairs(spark.table(table), "doc_id", "text", n = 3, tau = tau)(write)
    }
  }

  /** `triangles(table[, acol[, bcol]])` — per-node triangle counts and
    * local clustering coefficients `(node, deg, n_tri, cc_micro, cc)`
    * over an undirected edge relation (default columns `a`, `b`;
    * duplicates/reversals/self-loops absorbed). The degree-ordered
    * wedge-orientation plan — the same O(m^1.5) shape as the Scala path.
    */
  def trianglesBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.length <= 3, s"usage: $TrianglesName(table[, acol[, bcol]])")
    val table = FoldTableFunctions.stringArg(TrianglesName, args, 0)
    val aCol = if (args.length > 1) FoldTableFunctions.stringArg(TrianglesName, args, 1) else "a"
    val bCol = if (args.length > 2) FoldTableFunctions.stringArg(TrianglesName, args, 2) else "b"
    val spark = SparkSession.active
    SqlBridge.analyzedPlan(graft.ext.Graph.triangles(spark.table(table), aCol, bCol))
  }

  /** `containment_pairs(table[, tau])` — directed shingle-containment
    * pairs `(inner_id, outer_id, n_inner, n_shared, containment,
    * jaccard)` over a `(doc_id, text)` relation (3-gram shingles,
    * lossless asymmetric prefix filter). Routed through the artifact
    * cache like the other pair-graph TVFs: the shingle→prefix→verify
    * pipeline runs ONCE per (table, τ) PER SESSION, inside the kernel's
    * persist release scope; every later SQL call reads the parquet
    * snapshot. Consequence (the shared artifact contract above): the
    * result reflects the relation's contents at FIRST call — a pipeline
    * that mutates or replaces the view mid-session must register a
    * fresh view name to get fresh pairs, or it will read stale ones.
    */
  def containmentPairsBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.length <= 2, s"usage: $ContainmentPairsName(table[, tau])")
    val table = FoldTableFunctions.stringArg(ContainmentPairsName, args, 0)
    val tau = FoldTableFunctions.doubleArg(ContainmentPairsName, args, 1, 0.8)
    val spark = SparkSession.active
    cachedPlanScoped(s"$ContainmentPairsName:$table:$tau:${spark.sparkContext.applicationId}") { write =>
      Dedup.withContainmentPairs(spark.table(table), "doc_id", "text", n = 3, tau = tau)(write)
    }
  }

  /** `exact_substring_excise(table[, w])` — Lee-et-al-style exact-
    * substring dedup over a `(doc_id, text)` relation: every duplicated
    * token run ≥ w (default 8) keeps only its corpus-first occurrence;
    * rows are `(doc_id, n_spans, n_tokens_removed, clean_text)`. Routed
    * through the artifact cache (once per (table, w) PER SESSION — the
    * window-hash election is a corpus pass; mutated views need a fresh
    * view name, the shared artifact contract).
    */
  def exactSubstringBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.length <= 2, s"usage: $ExactSubstringName(table[, w])")
    val table = FoldTableFunctions.stringArg(ExactSubstringName, args, 0)
    val w = FoldTableFunctions.doubleArg(ExactSubstringName, args, 1, 8.0).toInt
    val spark = SparkSession.active
    cachedPlan(s"$ExactSubstringName:$table:$w:${spark.sparkContext.applicationId}") {
      Dedup.exciseExactSubstrings(spark.table(table), "doc_id", "text", w)
    }
  }

  /** `fuzzy_decontaminate(train_table, probe_table[, tau[, n]])` —
    * containment-based eval-set decontamination ledger: every train doc
    * with its verdict against the probe relation (C(probe→train) ≥ τ at
    * n-gram grain, default τ=0.4, n=2). Same once-per-session artifact
    * caching as the other pair-graph TVFs.
    */
  def fuzzyDecontamBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2 && args.length <= 5,
      s"usage: $FuzzyDecontamName(train_table, probe_table[, tau[, n[, maxDf]]])")
    val train = FoldTableFunctions.stringArg(FuzzyDecontamName, args, 0)
    val probe = FoldTableFunctions.stringArg(FuzzyDecontamName, args, 1)
    val tau = FoldTableFunctions.doubleArg(FuzzyDecontamName, args, 2, 0.4)
    val n = FoldTableFunctions.doubleArg(FuzzyDecontamName, args, 3, 2.0).toInt
    val maxDf = FoldTableFunctions.doubleArg(FuzzyDecontamName, args, 4, 100000.0).toInt
    val spark = SparkSession.active
    cachedPlan(s"$FuzzyDecontamName:$train:$probe:$tau:$n:$maxDf:${spark.sparkContext.applicationId}") {
      Dedup.fuzzyDecontamination(
        spark.table(train), spark.table(probe), "doc_id", "text",
        n = n, tau = tau, maxDf = maxDf)
    }
  }

  /** Runtime registration into a live session (the no-config twin of the
    * `spark.sql.extensions=graft.functions.GraftExtensions` path).
    */
  def register(spark: SparkSession): Unit = {
    SqlBridge.registerTableFunction(spark, MinhashPairsName, minhashPairsBuilder)
    SqlBridge.registerTableFunction(spark, TfidfTopKName, tfidfTopKBuilder)
    SqlBridge.registerTableFunction(spark, QualityLrName, qualityLrBuilder)
    SqlBridge.registerTableFunction(spark, KmvOverlapName, kmvOverlapBuilder)
    SqlBridge.registerTableFunction(spark, PpjoinPairsName, ppjoinPairsBuilder)
    SqlBridge.registerTableFunction(spark, DedupClustersName, dedupClustersBuilder)
    SqlBridge.registerTableFunction(spark, DedupExciseName, dedupExciseBuilder)
    SqlBridge.registerTableFunction(spark, TrianglesName, trianglesBuilder)
    SqlBridge.registerTableFunction(spark, ContainmentPairsName, containmentPairsBuilder)
    SqlBridge.registerTableFunction(spark, ExactSubstringName, exactSubstringBuilder)
    SqlBridge.registerTableFunction(spark, FuzzyDecontamName, fuzzyDecontamBuilder)
  }
}
