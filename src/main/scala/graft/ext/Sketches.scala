package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-pass mergeable sketches for corpus profiling at 100 TB scale:
  * HyperLogLog distinct-count registers and Count-Min frequency cells.
  *
  * Both are expressed as PLAIN AGGREGATIONS over deterministic md5-derived
  * hashes — no custom state, no UDAF: the "sketch" is a tiny DataFrame of
  * (bucket → register/count) cells produced by one partial-aggregated
  * shuffle. That buys the two properties that matter at scale for free:
  * map-side combine (registers fold with `max`, cells with `sum` inside
  * each partition before the exchange) and mergeability (union the cell
  * tables of two corpora and re-aggregate — the algebra of the sketch IS
  * the groupBy algebra). Every hash is replayable in SQL, so the whole
  * sketch, not just its summary, is oracle-checkable.
  */
object Sketches {

  /** 60-bit hash of a string column: the first 15 hex chars of its md5 —
    * positive in a signed 64-bit lane on every engine (the same idiom as
    * `Dedup.tokenHash60`; DuckDB: `('0x' || substr(md5(x), 1, 15))::BIGINT`).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** HyperLogLog registers over the distinct values of `valueCol` per
    * group, with m = 2^p buckets: bucket = hash60 mod m, register = rank
    * of the first 1-bit in the remaining 60−p bits (60−p+1 when they are
    * all zero). Emits one row per non-empty (group, bucket) with the max
    * rank — the standard HLL register table, built by ONE groupBy(max)
    * pass. Registers from different corpora merge by max — union + the
    * same groupBy re-aggregates.
    */
  /** (group, bucket, _rank) projection shared by the batch and streaming
    * register builders. Extra columns in `keep` pass through.
    */
  private def bucketRank(df: DataFrame, keep: Seq[Column], valueCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1L << p
    val rem = 60 - p
    df.select((keep :+ hash60(col(valueCol)).as("_h")): _*)
      .withColumn("bucket", col("_h") % m)
      .withColumn("_rest", expr(s"_h DIV $m"))
      .withColumn(
        "_rank",
        when(col("_rest") === 0L, lit(rem + 1))
          .otherwise(lit(rem + 1) - length(expr("bin(_rest)")))
          .cast("long"))
      .drop("_h", "_rest")
  }

  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String, p: Int): DataFrame =
    bucketRank(df, Seq(col(groupCol)), valueCol, p)
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("_rank")).as("register"))

  /** Fused shingle→hash→partial-register kernel: the whole
    * explode-3-grams-then-aggregate pipeline of
    * `hllRegisters(shingle-explode(docs))` collapsed into ONE
    * mapPartitions pass that never materializes a token row — each
    * partition keeps a group→registers array (m longs per group) and
    * emits only its non-zero cells, so the shuffle carries at most
    * groups·m rows per partition instead of a partially-aggregated token
    * stream, and no Tungsten row is built per shingle. Hash-identical to
    * the declarative path by construction: same space-split, same
    * md5-top-60-bit hash (first 15 hex chars = first 8 big-endian bytes
    * >>> 4), same bucket/rank arithmetic — the final groupBy(max) merges
    * partials exactly like the batch/streaming builders, so the same SQL
    * oracle replays it.
    */
  def hllShingleRegisters(df: DataFrame, groupCol: String, textCol: String, n: Int, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val rem = 60 - p
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val regs = new java.util.HashMap[String, Array[Long]]()
        val seen = new java.util.HashSet[String]() // per-doc distinct shingles: skip repeat md5 work
        rows.foreach { case (grp, text) =>
          val w = text.split(" ", -1)
          if (w.length >= n) {
            val r = regs.computeIfAbsent(grp, _ => new Array[Long](m))
            seen.clear()
            var i = 0
            while (i + n <= w.length) {
              val sb = new java.lang.StringBuilder(w(i))
              var j = 1
              while (j < n) { sb.append(' ').append(w(i + j)); j += 1 }
              val g = sb.toString
              if (seen.add(g)) {
                val d = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                var h = 0L
                var k = 0
                while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
                h = h >>> 4 // top 60 bits = first 15 hex chars of the digest
                val bucket = (h % m).toInt
                val rest = h >>> p
                val rank =
                  if (rest == 0L) (rem + 1).toLong
                  else (rem + 1).toLong - (64 - java.lang.Long.numberOfLeadingZeros(rest))
                if (rank > r(bucket)) r(bucket) = rank
              }
              i += 1
            }
          }
        }
        import scala.jdk.CollectionConverters._
        regs.entrySet().iterator().asScala.flatMap { e =>
          val r = e.getValue
          Iterator.range(0, m).filter(r(_) > 0L).map(b => (e.getKey, b.toLong, r(b)))
        }
      }
      .toDF(groupCol, "bucket", "_rank")
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("_rank")).as("register"))
  }

  /** Streaming HLL: windowed distinct-count registers over an unbounded
    * stream. Because a register is just max(rank) — an associative,
    * commutative aggregate — Structured Streaming maintains it natively
    * in the state store with NO custom state code: late data within the
    * watermark folds in by max, window state evicts at watermark close.
    * The output register table merges/estimates with the same
    * `hllEstimate` as batch. This is the shape of a streaming
    * distinct-users dashboard at any scale: state per (window, group,
    * bucket) is one long, bounded by m per group-window.
    */
  def hllRegistersStream(
      df: DataFrame,
      timeCol: String,
      groupCol: String,
      valueCol: String,
      p: Int,
      windowDuration: String,
      watermarkDelay: String): DataFrame =
    bucketRank(
      df.withWatermark(timeCol, watermarkDelay),
      Seq(col(timeCol), col(groupCol)), valueCol, p)
      .groupBy(window(col(timeCol), windowDuration), col(groupCol), col("bucket"))
      .agg(max(col("_rank")).as("register"))

  /** HLL estimate per group from a register table: the harmonic-mean
    * numerator Σ 2^(40−register) runs in EXACT integer fixed point
    * (registers past 40 truncate to 0 — far below any mass that matters),
    * empty buckets contribute 2^40 each, and the only floating-point
    * steps are the final constant multiply and divide — single IEEE ops
    * on integer-derived operands, identical on every engine. Emits the
    * raw (uncorrected) estimate plus `n_zero_buckets` so callers can
    * apply linear-counting/small-range corrections downstream.
    */
  def hllEstimate(registers: DataFrame, groupCol: String, p: Int): DataFrame = {
    val m = 1L << p
    // the standard HLL alpha_m: measured constants for the small register
    // counts where the asymptotic formula carries a systematic bias
    // (Flajolet et al. 2007, §4), asymptotic form from m = 128 up
    val alpha = m match {
      case 16L => 0.673
      case 32L => 0.697
      case 64L => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val scale = 1099511627776L // 2^40
    registers
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("_nb"),
        sum(expr(s"$scale DIV shiftleft(CAST(1 AS BIGINT), CAST(register AS INT))")).as("_s"))
      .select(
        col(groupCol),
        (lit(m) - col("_nb")).as("n_zero_buckets"),
        (col("_s") + (lit(m) - col("_nb")) * lit(scale)).as("sum_fp"),
        round(
          lit(alpha * m * m) * (lit(scale.toDouble) / (col("_s") + (lit(m) - col("_nb")) * lit(scale))),
          4).as("est_distinct"))
  }

  /** Count-Min sketch cells over a token stream: `depth` rows × `width`
    * columns, cell (j, c) = the number of tokens whose j-th md5-word
    * position is c. One explode (depth entries per token) + one
    * partial-aggregated shuffle — the cells table is depth·width rows no
    * matter the corpus size, and two corpora's sketches merge by
    * union + sum. Point estimates (`cmsEstimate`) are upper bounds:
    * min over rows of the addressed cells.
    */
  /** The (row_idx, col_idx) cell addresses of a token — THE one
    * definition of the CMS hash layout, shared by the batch cells, the
    * streaming cells, and the point-query addressing (they must stay
    * identical or estimates stop folding).
    */
  private def cmsAddr(tokenCol: String, depth: Int, width: Int): Seq[Column] = {
    require(depth >= 1 && depth <= 4, s"depth must be in [1,4] (md5 has 4 words), got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    (0 until depth).map { j =>
      struct(
        lit(j.toLong).as("row_idx"),
        (conv(substring(md5(col(tokenCol)), 1 + 8 * j, 8), 16, 10).cast("long") % width).as("col_idx"))
    }
  }

  def cmsCells(df: DataFrame, tokenCol: String, depth: Int, width: Int): DataFrame = {
    df.select(explode(array(cmsAddr(tokenCol, depth, width): _*)).as("_rc"))
      .select(col("_rc.row_idx"), col("_rc.col_idx"))
      .groupBy("row_idx", "col_idx")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Streaming Count-Min: windowed frequency cells over an unbounded
    * token stream — like `hllRegistersStream`, the cell is a plain
    * associative aggregate (sum), so Structured Streaming maintains it
    * natively; state is bounded by depth·width per window regardless of
    * stream volume, and closed-window cells merge with batch cells by
    * sum.
    */
  def cmsCellsStream(
      df: DataFrame,
      timeCol: String,
      tokenCol: String,
      depth: Int,
      width: Int,
      windowDuration: String,
      watermarkDelay: String): DataFrame = {
    df.withWatermark(timeCol, watermarkDelay)
      .select(col(timeCol), explode(array(cmsAddr(tokenCol, depth, width): _*)).as("_rc"))
      .select(col(timeCol), col("_rc.row_idx"), col("_rc.col_idx"))
      .groupBy(window(col(timeCol), windowDuration), col("row_idx"), col("col_idx"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Count-Min point query for a set of probe tokens against a cells
    * table: estimate = min over rows of cell(j, h_j(token)); absent
    * cells read 0. Never underestimates the true count.
    */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, tokenCol: String, depth: Int, width: Int): DataFrame = {
    probes
      .select(col(tokenCol), explode(array(cmsAddr(tokenCol, depth, width): _*)).as("_rc"))
      .select(col(tokenCol), col("_rc.row_idx"), col("_rc.col_idx"))
      .join(broadcast(cells), Seq("row_idx", "col_idx"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Join-cardinality estimation from two Count-Min sketches — the
    * optimizer trick behind "how big is A ⋈ B on this key" without
    * touching either table again: the inner product of two CMS rows,
    * Σ_c a[j,c]·b[j,c], upper-bounds the true join size
    * Σ_key cntA(key)·cntB(key) (collisions only ADD mass), and the min
    * over the depth rows is the standard tightened estimate. Both sides'
    * cells are depth·width rows regardless of table size, so the estimate
    * costs a tiny cell join — this is how a planner decides
    * broadcast-vs-shuffle or pre-sizes shuffle partitions at 100 TB.
    * All-integer (cell counts, products, sums) → replays exactly in SQL.
    */
  def cmsJoinSizeEstimate(cellsA: DataFrame, cellsB: DataFrame): DataFrame = {
    val overlap = cellsA.as("a")
      .join(cellsB.as("b"), Seq("row_idx", "col_idx"))
      .groupBy(col("row_idx"))
      .agg(sum(col("a.cnt") * col("b.cnt")).as("inner_product"))
    // a depth row with ZERO overlapping cells has inner product 0 and is
    // absent from the inner join — it must still participate in the min
    // (it proves the join is empty), so re-anchor on every depth row of
    // the a-side sketch (any non-empty input populates all of them)
    cellsA.select(col("row_idx")).distinct()
      .join(overlap, Seq("row_idx"), "left")
      .agg(coalesce(min(coalesce(col("inner_product"), lit(0L))), lit(0L)).as("est_join_rows"))
  }

  /** Distribution DRIFT per window: total-variation distance (L1/2, in
    * integer per-mille) between each window's token-bucket distribution
    * and a reference distribution — the ingest guardrail that pages when
    * a crawl window's content shifts ("today's batch is 40% one domain's
    * boilerplate"). Both sides are depth-1 CMS cell tables (md5 bucket →
    * count), so the windowed side can be maintained LIVE by
    * `cmsCellsStream` and drift computed over closed windows — counter
    * additivity makes the replayed stream bit-equal to batch.
    *
    * All-integer: drift_milli = ⌊Σ_b |c_b·M − r_b·N| · 1000 / (2·N·M)⌋
    * with N = window tokens, M = reference tokens — no fp distribution
    * normalization to diverge between engines. Bound: N·M must fit a
    * long (< 2⁶²); at extreme corpus scale, downscale the reference
    * counts first (divide all r_b by a common factor — TV distance is
    * scale-invariant up to the ⌊⌋ grid).
    *
    * `winCells`: (window_start, col_idx, cnt); `refCells`:
    * (col_idx, cnt). Buckets absent from one side count as zero — the
    * union grid is windows × reference buckets plus each window's
    * off-reference buckets (anti-join), so novel-vocabulary mass is
    * charged, not dropped. The reference table is ≤ width rows (its
    * total collects driver-side as a literal — bounded by construction).
    */
  def distributionDrift(winCells: DataFrame, refCells: DataFrame): DataFrame = {
    val m = refCells.agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
    require(m > 0, "reference distribution is empty")
    val wins = winCells.groupBy(col("window_start"))
      .agg(sum(col("cnt")).as("n_tokens"))
    val refB = refCells.select(col("col_idx"), col("cnt").as("_r"))
    val onGrid = wins.crossJoin(refB)
      .join(winCells, Seq("window_start", "col_idx"), "left")
      .select(
        col("window_start"), col("n_tokens"),
        coalesce(col("cnt"), lit(0L)).as("_c"), col("_r"))
    val offGrid = winCells.join(refB, Seq("col_idx"), "left_anti")
      .join(wins, Seq("window_start"))
      .select(
        col("window_start"), col("n_tokens"),
        col("cnt").as("_c"), lit(0L).as("_r"))
    onGrid.unionByName(offGrid)
      .groupBy(col("window_start"), col("n_tokens"))
      .agg(sum(abs(col("_c") * m - col("_r") * col("n_tokens"))).as("_num"))
      .select(
        col("window_start"), col("n_tokens"),
        expr(s"_num * 1000 DIV (2 * n_tokens * ${m}L)").as("drift_milli"))
  }

  /** Equi-width histogram cells for approximate quantiles — the third
    * mergeable sketch, same algebra as the CMS/HLL tables: ONE
    * partial-aggregated groupBy produces at most `bins` rows per group no
    * matter the input size, and two corpora's histograms merge by
    * union + `mergeHistograms`. The value column is first projected onto
    * an EXACT integer unit lane (`unit = round(v · unitScale)`, e.g.
    * cents for money columns) so binning, ranks, and interpolation all
    * run in integer arithmetic — the whole sketch replays bit-identically
    * in SQL. `binUnits` is the bin width in units; values outside
    * [0, bins·binUnits) clamp into the edge bins.
    */
  def histogramCells(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      unitScale: Int,
      binUnits: Long,
      bins: Int): DataFrame = {
    require(bins >= 2 && binUnits >= 1, s"need bins >= 2 and binUnits >= 1, got $bins/$binUnits")
    df.select(
        col(groupCol),
        expr(s"CAST(round($valueCol * $unitScale, 0) AS BIGINT)").as("_u"))
      .withColumn("bin", least(greatest(expr(s"_u DIV $binUnits"), lit(0L)), lit(bins - 1L)))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histogram cell tables (union the inputs first): bins fold by
    * sum — the groupBy algebra IS the sketch's merge operator.
    */
  def mergeHistograms(cells: DataFrame, groupCol: String): DataFrame =
    cells.groupBy(col(groupCol), col("bin")).agg(sum(col("cnt")).as("cnt"))

  /** Streaming histogram cells: the third streaming sketch, same native
    * state story as `hllRegistersStream`/`cmsCellsStream` — a count per
    * (window, group, bin) is an associative sum the state store maintains
    * directly; state ≤ bins per group-window, evicted at watermark close.
    * Output windows merge with batch cells via `mergeHistograms` and feed
    * the same `histogramQuantiles` — a live latency-percentile dashboard
    * whose math is identical to the batch sketch.
    */
  def histogramCellsStream(
      df: DataFrame,
      timeCol: String,
      groupCol: String,
      valueCol: String,
      unitScale: Int,
      binUnits: Long,
      bins: Int,
      windowDuration: String,
      watermarkDelay: String): DataFrame = {
    require(bins >= 2 && binUnits >= 1, s"need bins >= 2 and binUnits >= 1, got $bins/$binUnits")
    df.withWatermark(timeCol, watermarkDelay)
      .select(
        col(timeCol), col(groupCol),
        expr(s"CAST(round($valueCol * $unitScale, 0) AS BIGINT)").as("_u"))
      .withColumn("bin", least(greatest(expr(s"_u DIV $binUnits"), lit(0L)), lit(bins - 1L)))
      .groupBy(window(col(timeCol), windowDuration), col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Interpolated quantiles (per-mille points, e.g. 500 = p50) from a
    * histogram cell table. Integer arithmetic end to end: target rank =
    * ⌈q·total/1000⌉, the owning bin is the one whose cumulative count
    * first reaches it, and the within-bin linear interpolation
    * `(target − cum_before) · binUnits DIV cnt` stays in units; the only
    * floating-point op is the final divide by `unitScale`. The windows
    * are PARTITIONED by group over the cell table (≤ `bins` rows per
    * group) — no global sort, no single-partition exchange, regardless of
    * input scale.
    */
  def histogramQuantiles(
      cells: DataFrame,
      groupCol: String,
      qMille: Seq[Int],
      unitScale: Int,
      binUnits: Long): DataFrame = {
    require(qMille.nonEmpty && qMille.forall(q => q >= 1 && q <= 1000), s"qMille out of (0,1000]: $qMille")
    val byGroup = Window.partitionBy(col(groupCol))
    val cc = cells
      .withColumn("cum", sum(col("cnt")).over(byGroup.orderBy(col("bin"))))
      .withColumn("total", sum(col("cnt")).over(byGroup))
    cc.select(
        col(groupCol), col("bin"), col("cnt"), col("cum"), col("total"),
        explode(array(qMille.map(q => lit(q.toLong)): _*)).as("q_mille"))
      .withColumn("target", greatest(expr("(q_mille * total + 999) DIV 1000"), lit(1L)))
      .where(col("cum") >= col("target") && col("cum") - col("cnt") < col("target"))
      .withColumn(
        "est_units",
        col("bin") * binUnits + expr(s"((target - (cum - cnt)) * $binUnits) DIV cnt"))
      .select(
        col(groupCol), col("q_mille"), col("est_units"),
        round(col("est_units") / unitScale.toDouble, 4).as("est_value"))
  }

  /** K-Minimum-Values (bottom-k) distinct sketch: per group, the k
    * smallest `hash60` values over the distinct values of `valueCol`
    * (Bar-Yossef et al. 2002 / the DataSketches "theta" family). Unlike
    * HLL it supports SET ALGEBRA — two groups' sketches merge by
    * re-ranking their union, and the k-smallest of the union carry exact
    * membership bits for intersection/Jaccard estimation — which is what
    * cross-corpus overlap auditing needs (e.g. "how much of source A is
    * in source B" before mixing).
    *
    * Scale shape: the rank filter is a rank-like window, so Spark's
    * `InferWindowGroupLimit` inserts a per-partition partial top-k BEFORE
    * the exchange — the shuffle carries at most k rows per group per
    * input partition, never the full distinct-hash stream. State is k
    * longs per group, constant in corpus size. `dense_rank` (not
    * row_number) keeps duplicate hashes on one rank so the pre-distinct
    * stream needs no dedup shuffle first; the trailing `distinct` runs
    * over ≤ parts·k rows per group.
    *
    * Every hash is md5-replayable: the whole sketch table (not just its
    * estimate) is SQL-oracle-checkable.
    */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val byGroup = Window.partitionBy(col(groupCol)).orderBy(col("hval"))
    df.select(col(groupCol), hash60(col(valueCol)).as("hval"))
      .withColumn("pos", dense_rank().over(byGroup))
      .where(col("pos") <= k) // raw rank predicate → InferWindowGroupLimit fires
      .withColumn("pos", col("pos").cast("long"))
      .distinct()
  }

  /** Fused tokenize→hash→partial-bottom-k kernel: the whole
    * explode-tokens-then-rank pipeline of `kmvSketch(token-explode(docs))`
    * collapsed into ONE mapPartitions pass (the `hllShingleRegisters`
    * pattern) — each partition keeps a group→TreeSet of at most k hashes
    * and emits only those ≤ k·groups rows, so no per-token Tungsten row
    * or shuffle entry ever exists; tokens above the partition's current
    * k-th smallest hash don't even allocate. Hash-identical to the
    * declarative path by construction (same single-space split, same
    * md5-top-60-bit hash), and the trailing distinct+rank merges partials
    * exactly like `kmvMerge` — the same SQL oracle replays it, and
    * equality with `kmvSketch` is pinned in SketchesSpec.
    *
    * Schema note: the group column surfaces as STRING (the kernel's map
    * key), unlike the type-preserving declarative `kmvSketch` — cast the
    * group key back (or sketch with `kmvSketch`) before unioning the two
    * forms or joining on a non-string group key.
    */
  def kmvTokenSketch(df: DataFrame, groupCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val partials = df
      .select(col(groupCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val sets = new java.util.HashMap[String, java.util.TreeSet[java.lang.Long]]()
        rows.foreach { case (grp, text) =>
          val set = sets.computeIfAbsent(grp, _ => new java.util.TreeSet[java.lang.Long]())
          val toks = text.split(" ", -1)
          var i = 0
          while (i < toks.length) {
            val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            var h = 0L
            var b = 0
            while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
            h = h >>> 4 // top 60 bits = first 15 hex chars of the digest
            if (set.size < k) { set.add(h): Unit }
            else if (h < set.last) {
              set.add(h)
              if (set.size > k) { set.pollLast(): Unit }
            }
            i += 1
          }
        }
        import scala.jdk.CollectionConverters._
        sets.entrySet().iterator().asScala.flatMap { e =>
          e.getValue.iterator().asScala.map(h => (e.getKey, h.longValue()))
        }
      }
      .toDF(groupCol, "hval")
    kmvMerge(partials, groupCol, k)
  }

  /** Merge KMV sketch tables (union the inputs first): re-rank and keep
    * the k smallest per group — the bottom-k of a union is the bottom-k
    * of the union of bottom-ks, so merging loses nothing. Output carries
    * the same (group, hval, pos) layout as `kmvSketch`.
    */
  def kmvMerge(sketches: DataFrame, groupCol: String, k: Int): DataFrame = {
    val byGroup = Window.partitionBy(col(groupCol)).orderBy(col("hval"))
    sketches
      .select(col(groupCol), col("hval"))
      .distinct()
      .withColumn("pos", row_number().over(byGroup))
      .where(col("pos") <= k)
      .withColumn("pos", col("pos").cast("long"))
  }

  private val KmvSpace = 1152921504606846976.0 // 2^60, the hash60 range

  /** Distinct estimate from a KMV sketch: (k−1) · 2^60 / h_k with h_k the
    * k-th smallest hash; exact count when the group holds fewer than k
    * distinct values (the sketch IS the value set then). Like
    * `hllEstimate`, the only floating-point steps are one divide and one
    * multiply on integer-derived operands — identical IEEE ops on every
    * engine.
    */
  def kmvEstimate(sketch: DataFrame, groupCol: String, k: Int): DataFrame =
    sketch
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_vals"), max(col("hval")).as("hk"))
      .select(
        col(groupCol),
        col("n_vals"),
        round(
          when(col("n_vals") < k, col("n_vals").cast("double"))
            .otherwise(lit((k - 1).toDouble) * (lit(KmvSpace) / col("hk"))),
          4).as("est_distinct"))

  /** Pairwise cross-group overlap from ONE KMV sketch table: for every
    * unordered group pair (ga < gb), merge the two sketches (k smallest
    * of the union, with membership bits) and estimate
    * Jaccard = |bottom-k(A∪B) ∩ A ∩ B| / |bottom-k(A∪B)| plus the union
    * cardinality — the standard KMV set-algebra estimators. When the two
    * groups hold fewer than k distinct values combined, both outputs are
    * EXACT. Work is pairs·k rows end to end: the group-pair frame is a
    * broadcast, the merge a window over ≤ 2k rows per pair — nothing
    * scales with corpus size, only with the number of groups.
    */
  def kmvOverlap(sketch: DataFrame, groupCol: String, k: Int): DataFrame = {
    // one aggregation packs each group's sketch into a ≤k ascending array
    // (bounded partial state — the input is already ≤k rows per group),
    // then the group-pair frame is a broadcast cross of #groups rows and
    // every estimator is in-row array algebra: merged bottom-k =
    // slice(sort(union)), membership via intersect — no per-hash shuffle,
    // no window, pairs·k work total
    val s = sketch
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(sort_array(collect_set(col("hval"))).as("hs"))
    s.select(col("g").as("ga"), col("hs").as("ha"))
      .join(broadcast(s.select(col("g").as("gb"), col("hs").as("hb"))), col("ga") < col("gb"))
      .withColumn("mk", slice(array_sort(array_union(col("ha"), col("hb"))), 1, k))
      .withColumn("n_merged", size(col("mk")).cast("long"))
      .withColumn(
        "n_both",
        size(array_intersect(array_intersect(col("mk"), col("ha")), col("hb"))).cast("long"))
      .withColumn("hk", element_at(col("mk"), -1))
      .select(
        col("ga"),
        col("gb"),
        round(col("n_both") / col("n_merged").cast("double"), 4).as("jaccard_est"),
        round(
          when(col("n_merged") < k, col("n_merged").cast("double"))
            .otherwise(lit((k - 1).toDouble) * (lit(KmvSpace) / col("hk"))),
          4).as("union_est"))
  }
}
