package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over an edge table — the companion to the dedup
  * pipeline's label-propagation components (`Dedup.clusters`): where LP
  * answers "which docs are the same", PageRank answers "which nodes
  * matter", the crawl-prioritization / source-authority signal of a
  * training-data pipeline (rank domains by who syndicates whom, weight
  * mixing toward authoritative sources).
  *
  * Standard distributed formulation: each iteration is ONE equi-join of
  * the rank table onto the edge list plus one partial-aggregated groupBy
  * on dst — no driver-side state, no collect; cost per round is
  * O(|edges|) shuffled by node key, the textbook Pregel-on-a-join shape
  * that scales to any edge count Spark can shuffle.
  *
  * Determinism: ranks live in integer MICRO-units (start 1e6 per node).
  * Per round, a node keeps teleport mass (1−d) = 150000 micro and ships
  * d = 850/1000 of its rank split proportionally over out-edge weights,
  * with explicit truncating division at each step —
  * `((rm · 850) DIV 1000) · w DIV ow` — so every engine computes the
  * identical integers (all operands positive: truncation == floor in
  * Spark and DuckDB alike). Mass lost to truncation and to dangling
  * nodes (no out-edges) is dropped, not redistributed — the simple PR
  * variant; ranks are comparison signals, not probabilities.
  */
object Graph {

  /** `iters` PageRank rounds over weighted directed edges
    * (srcCol, dstCol, wCol). Returns (node, rank_micro, rank) for every
    * node appearing as a source or destination.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1,20], got $iters")
    val spark = edges.sparkSession
    // w >= 1 enforced: a zero/negative weight would make `DIV ow` NULL in
    // Spark (contribution silently dropped) but raise division-by-zero in
    // the SQL oracle — same edge set in both engines, guaranteed loudly.
    // CONTRACT: the filter defines the graph — a vertex whose every
    // incident edge has w < 1 is excluded from the NODE set too (no
    // teleport-only row for it). Callers needing a complete vertex table
    // should union their node list back in after ranking; ranking nodes
    // against a different edge set than the one that defined them would
    // be the worse surprise.
    val e = edges.select(
        col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"),
        col(wCol).cast("long").as("w"))
      .where(col("w") >= 1L)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val ew = e.join(outW, "src") // (src, dst, w, ow) — static across rounds
    // Lineage control (the `Dedup.clusters` flat-lineage pattern, applied
    // every K rounds instead of every round): the naive loop unrolls
    // `iters` join+groupBy layers into one plan that Catalyst re-analyzes
    // each round — fine at iters=3, seconds of driver time by iters=20.
    // But a PER-round RDD rebuild is pure overhead at small iters (no
    // eager action needs each round, unlike clusters' convergence check),
    // and each RDD boundary blocks the exchange reuse that makes the
    // unrolled plan cheap (ew/nodes subtrees dedup to ONE shuffle within
    // a single physical plan — measured 4-7x on the gate rows when every
    // round got its own boundary). So: stay unrolled within segments of
    // `rematEvery` rounds, rebuild the rank table as a fresh DataFrame
    // over its plan's RDD only at segment boundaries. The boundary RDD is
    // NOT persisted: each boundary has exactly one downstream reference
    // (round i+1's contribs join), so within the caller's single action
    // it computes exactly once anyway — a persist would only serve
    // repeated actions, which this lazy API doesn't promise, and the
    // final segment's cache would outlive the call (a session-lifetime
    // block-manager leak). A caller that DOES act repeatedly should
    // cache/checkpoint the returned frame itself.
    val rematEvery = 8
    var rank = nodes.withColumn("rm", lit(1000000L))
    for (i <- 1 to iters) {
      val contribs = ew
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("(((rm * 850) DIV 1000) * w) DIV ow").as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("in_mass"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"), (lit(150000L) + coalesce(col("in_mass"), lit(0L))).as("rm"))
      rank = if (i % rematEvery == 0 && i < iters) {
        spark.createDataFrame(next.rdd, next.schema)
      } else next
    }
    rank.select(
      col("node"),
      col("rm").as("rank_micro"),
      (col("rm") / 1000000.0).as("rank"))
  }
}
