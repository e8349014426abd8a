package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the scale properties the README promises
  * (pushdown reaches the scan, dims broadcast, top-k avoids a global
  * sort, detector pipeline keeps its exchange budget) are pinned here so
  * a refactor can't silently regress them.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("plan-spec")
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1_agg: shipdate filter and column pruning reach the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("ReadSchema: struct<l_quantity:double"), "projection should prune to needed columns")
  }

  test("q3_top_orders: customer dim joins via broadcast, top-10 via TakeOrderedAndProject") {
    val p = plan("q3_top_orders")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_topk: distributed top-k, not a global sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange rangepartitioning"), "must not globally range-sort for a limit")
  }

  test("anomaly_derivative_scores: guard is a broadcast semi-join; bounded exchanges") {
    val p = plan("anomaly_derivative_scores")
    assert(p.contains("BroadcastHashJoin LeftSemi") || p.contains("LeftSemi"))
    val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
    // fold repartition + post-fold stats join/window (+ tiny agg exchange)
    assert(exchanges <= 4, s"detector pipeline grew to $exchanges shuffles:\n$p")
  }

  test("anomaly_windows: the three window passes share one exchange over the scored data") {
    val p = plan("anomaly_windows")
    val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
    assert(exchanges <= 4, s"window pipeline grew to $exchanges shuffles")
  }

  test("dedup_embedding: no shuffle at all (broadcast-matrix pass)") {
    val p = plan("dedup_embedding")
    val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
    assert(exchanges <= 1, s"cosine pairs should be a single scan pass, saw $exchanges shuffles")
  }

  test("sim_lsh_topk: candidates come from a broadcast equi-join on bucket keys, never a cartesian") {
    val p = plan("sim_lsh_topk")
    assert(p.contains("BroadcastHashJoin"), "query side must broadcast against the bucketed corpus")
    assert(!p.contains("CartesianProduct"), "LSH must never degrade to all-pairs")
  }

  test("sim_ivf_topk: probe is broadcast joins only — no cartesian over the corpus, no training stage") {
    val p = plan("sim_ivf_topk")
    assert(p.contains("BroadcastHashJoin"), "probes must broadcast against the cell-assigned corpus")
    // the only cross is queries x nlist centroids (tiny, broadcast)
    val bigCartesian = p.contains("CartesianProduct")
    assert(!bigCartesian, "corpus side must join on cell id")
  }

  test("dedup_minhash_lsh: banded candidates join on short keys; no cartesian anywhere") {
    val p = plan("dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct"), "LSH banding must never produce an all-pairs join")
    // since round 7 the pair graph is a PARQUET ARTIFACT (survives bench
    // isolation's clearCache), so consumers must read the artifact file —
    // never re-derive the signature+banding pipeline
    assert(p.contains("graft_pairs_"), s"pair table must be read from the persisted artifact:\n$p")
    assert(!p.contains("md5("), "a consumer plan containing the signature pipeline means the artifact was bypassed")
  }

  test("dedup_embedding_lsh: bucket equi-join candidates, never a cartesian") {
    // the QUERY row reads the session artifact since r12 (the
    // load-sensitivity pin), so the plan-shape pin targets the KERNEL
    // the artifact build runs — lshPairs on the same inputs
    val p = graft.ext.Similarity.lshPairs(
      Tables.embeddings(spark, sf), "vec_id", "embedding", tau = 0.4, dims = 64, nBits = 6)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "LSH pair generation must never degrade to all-pairs")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"),
      s"candidates must come from an equi-join on the bucket key:\n$p")
    // and the query row itself must read the persisted artifact
    assert(plan("dedup_embedding_lsh").contains("graft_emblsh_"),
      "the query row must read the session artifact, not re-derive the kernel")
  }

  test("profile_sketch: register aggregation — no exact-distinct Expand rewrite") {
    val p = plan("profile_sketch")
    assert(!p.toLowerCase.contains("count(distinct"),
      "the sketch profiler must never fall back to exact countDistinct")
    assert(!p.contains("Expand"),
      s"per-column stacking is a Generate, not the countDistinct Expand rewrite:\n$p")
  }

  test("anomaly_exp_avg_chunked: chunk passes hash-partition by (key, chunk) — no single-task stage") {
    val p = plan("anomaly_exp_avg_chunked")
    assert(!p.contains("SinglePartition"), s"chunked fold must not serialize onto one partition:\n$p")
    assert(p.contains("hashpartitioning(seriesKey"), "chunk passes must partition by key+chunk")
  }

  test("text_repetition: zero-shuffle narrow map with pruned scan") {
    val p = plan("text_repetition")
    val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
    assert(exchanges == 0, s"per-doc metrics must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan must prune to (doc_id, text)")
  }

  test("pack_greedy: exactly one exchange (cluster by group), fold via the custom node") {
    val p = plan("pack_greedy")
    val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
    assert(exchanges == 1, s"packing is one shuffle on the group key:\n$p")
  }

  test("anomaly_exp_avg_scores / derivative: fold plans through the custom Catalyst node") {
    assert(plan("anomaly_exp_avg_scores").contains("KeyedFold "),
      "EMA fold must use the declared-requirements operator")
    assert(plan("anomaly_derivative_scores").contains("KeyedFold "),
      "derivative fold must use the declared-requirements operator")
  }

  test("q_skew_join: shuffles on the salted key, not the bare hot key") {
    val p = plan("q_skew_join")
    assert(p.contains("_fsalt"), s"join must be salted:\n$p")
  }

  test("events_funnel: per-step filters pushed to the scan; one user-key exchange") {
    val p = plan("events_funnel")
    assert(p.contains("EqualTo(event_type,view)") && p.contains("EqualTo(event_type,click)"),
      "step predicates must reach the parquet scans")
    val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
    assert(exchanges <= 1, s"funnel is one exchange on the user key, saw $exchanges:\n$p")
  }

  test("layout_zorder: output path is a narrow codegen'd map; only the bounds aggregate shuffles") {
    val p = plan("layout_zorder")
    val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
    // one tiny single-row exchange for the min/max quantization bounds;
    // the corpus itself never shuffles — it streams through the
    // broadcast join + interleave projection
    assert(exchanges <= 1, s"z-value assignment must not shuffle the data:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "quantization bounds must broadcast")
    // codegen wrapping is applied at AQE stage execution and is not
    // visible in the pre-execution plan display, so it is asserted
    // structurally instead: the output path is Project-only (codegen-
    // supported operators), with no interpreted-only node between the
    // scan and the interleave
    assert(!p.contains("mapPartitions") && !p.contains("DeserializeToObject"),
      "interleave path must stay in codegen-capable declarative operators")
  }

  test("decontaminate_bloom: zero corpus shuffle (bitset broadcast, kernel pass)") {
    val p = plan("decontaminate_bloom")
    val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
    assert(exchanges == 0, s"bloom screen must not shuffle the corpus:\n$p")
  }

  test("text_chunks: zero-shuffle per-row chunking with pruned scan") {
    val p = plan("text_chunks")
    val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
    assert(exchanges == 0, s"chunking must not shuffle:\n$p")
  }

  test("text_robust_norm: output path is exchange-free; side stats broadcast") {
    val p = plan("text_robust_norm")
    assert(p.contains("BroadcastHashJoin"), "med/mad tables must broadcast")
    // all shuffles live under the broadcast side-table derivations: the
    // top-level (output) plan segment before the first BroadcastExchange
    // must contain none
    val head = p.substring(0, p.indexOf("BroadcastExchange"))
    assert(!head.contains("Exchange hashpartitioning"),
      s"output path must not re-shuffle the corpus:\n$p")
  }

  test("events_cube: a single expand+aggregate pass, not one scan per grouping set") {
    val p = plan("events_cube")
    assert(p.contains("Expand"), "CUBE must plan through Expand")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"cube must scan once, saw $scans:\n$p")
  }

  test("q_skew_report: hot keys via TakeOrderedAndProject; one-row totals broadcast") {
    val p = plan("q_skew_report")
    assert(p.contains("TakeOrderedAndProject"), "top-k keys must not globally sort")
    assert(!p.contains("Exchange rangepartitioning"), s"no global sort allowed:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the one-row totals must broadcast")
  }

  test("sketch_quantile: all windows partitioned — no single-partition exchange") {
    val p = plan("sketch_quantile")
    assert(!p.contains("Exchange SinglePartition"),
      s"quantile windows must stay partitioned by group:\n$p")
  }

  test("profile_stats: all columns profiled from one scan (distincts via Expand)") {
    val p = plan("profile_stats")
    assert(p.contains("Expand"), "multiple countDistincts must rewrite through Expand")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"profile must scan once, saw $scans:\n$p")
  }

  test("round-6 pipeline operators: every window is partitioned — no single-partition exchange") {
    for (q <- Seq(
        "merge_changelog", "compact_plan", "shard_shuffle",
        "sample_budget_cap", "text_inverted_index")) {
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition"),
        s"$q must not collapse to one partition:\n$p")
    }
  }

  test("sim_int8_topk: query side broadcasts; corpus never shuffles before the top-k window") {
    val p = plan("sim_int8_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the small query side must broadcast")
    assert(!p.contains("Exchange SinglePartition"), s"no single-partition exchange:\n$p")
  }

  test("sketch_kmv: partial bottom-k (WindowGroupLimit) runs BEFORE the exchange") {
    // the declarative kmvSketch path — the fused gate kernel shares its
    // merge tail, so the pushdown property is pinned on the generic form
    val df = graft.ext.Sketches.kmvSketch(
      graft.Tables.documents(spark, sf)
        .select(org.apache.spark.sql.functions.col("source"),
          org.apache.spark.sql.functions.explode(
            org.apache.spark.sql.functions.split(org.apache.spark.sql.functions.col("text"), " ")).as("tok")),
      "source", "tok", 128)
    val p = df.queryExecution.executedPlan.toString
    val partialBeforeExchange = p.linesIterator.indexWhere(_.contains("WindowGroupLimit")) >= 0 &&
      "WindowGroupLimit".r.findAllIn(p).size >= 2
    assert(partialBeforeExchange, s"expected partial+final WindowGroupLimit pair:\n$p")
  }

  test("text_quality_lr: weight table joins via broadcast; one partial-agg exchange") {
    val p = plan("text_quality_lr")
    assert(p.contains("BroadcastHashJoin"), "the model must broadcast")
    val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
    assert(exchanges <= 1, s"scoring must shuffle once (per-doc agg), saw $exchanges:\n$p")
  }

  test("dedup_ppjoin / dedup_semantic / graph_pagerank: equi-join candidates, never a cartesian") {
    for (q <- Seq("dedup_ppjoin", "dedup_semantic", "graph_pagerank")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q must not plan a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q must join on keys, not loop:\n$p")
    }
  }

  test("emb_classify: L prototypes broadcast to a map-side argmax; one per-id agg exchange") {
    val p = plan("emb_classify")
    // the prototype side is a handful of rows — anything but a broadcast
    // loop/hash join over it means the corpus got shuffled for L rows
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"prototypes must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast cartesian:\n$p")
    val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
    // centroid build (posexplode agg) + the final per-id argmax agg
    assert(exchanges <= 3, s"classification should shuffle for aggs only, saw $exchanges:\n$p")
  }

  test("sample_split_safe / curation_pipeline / mm_scene_cuts: keyed joins and windows, no cartesian") {
    for (q <- Seq("sample_split_safe", "curation_pipeline", "mm_scene_cuts", "mm_shots")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q must not plan a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q must join on keys, not loop:\n$p")
    }
    // the scene-cut window is partitioned by video — a missing partition
    // spec would be a single-task global sort at scale
    val pc = plan("mm_scene_cuts")
    assert(!pc.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      s"scene-cut window must be per-video, not global:\n$pc")
  }

  test("ts_acf / ts_periodogram: ONE key exchange shared by window and aggregate; pruned scan") {
    for (q <- Seq("ts_acf", "ts_periodogram")) {
      val p = plan(q)
      val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
      assert(exchanges == 1, s"$q must shuffle exactly once (lag/rank window + per-key agg " +
        s"share the key partitioning), saw $exchanges:\n$p")
      assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
        s"$q must stay per-series, never a global sort:\n$p")
      assert(p.contains("ReadSchema: struct<ts:timestamp_ntz,user_id:bigint,value:double>"),
        s"$q must prune the events scan to (ts, user_id, value):\n$p")
    }
    // the period dimension is aggregate COLUMNS, not an explode before the
    // shuffle: the only Generate sits above the aggregate (23 rows/series)
    val pg = plan("ts_periodogram")
    val genIdx = pg.indexOf("Generate")
    val aggIdx = pg.indexOf("HashAggregate")
    assert(genIdx >= 0 && aggIdx > genIdx,
      s"periodogram explode must be ABOVE the aggregate (post-reduction):\n$pg")
  }
}
