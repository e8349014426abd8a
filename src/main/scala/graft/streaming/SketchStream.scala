package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV (bottom-k) distinct sketch — the live twin of
  * `Sketches.kmvSketch`, and the streaming sketch that needs CUSTOM state
  * (unlike HLL/CMS/histogram, whose registers are plain max/sum
  * aggregates): the k smallest hashes per group are an order-statistic,
  * maintained here in `flatMapGroupsWithState` as one sorted ≤k-long
  * array per group — state is k longs per group FOREVER, independent of
  * stream length, which is the whole point of the sketch.
  *
  * Convergence contract: the bottom-k of a set is insertion-order
  * independent, so after any replay/chunking the final snapshot per
  * group equals the batch sketch over the same distinct hashes exactly —
  * proven at the gate by `stream_kmv` against the batch SQL oracle.
  * Each micro-batch emits the group's full current snapshot (≤k longs)
  * with a per-group sequence number; consumers keep a group's
  * max-sequence row for the live estimate (a distinct-count dashboard
  * that also supports KMV set algebra downstream).
  */
object SketchStream {

  /** One hashed-token arrival; `ord` orders the replay chunking. */
  final case class TokArrival(grp: String, ord: Long, hval: Long)

  /** Per-group state: ascending bottom-k hashes + emission sequence. */
  final case class KmvState(hashes: Array[Long], seq: Long)

  /** Per-batch emission: the group's current snapshot. */
  final case class KmvSnapshot(grp: String, seq: Long, hashes: Array[Long])

  def kmvStream(arrivals: Dataset[TokArrival], k: Int): Dataset[KmvSnapshot] = {
    require(k >= 2, s"k must be >= 2, got $k")
    import arrivals.sparkSession.implicits._
    arrivals
      .groupByKey(_.grp)
      .flatMapGroupsWithState[KmvState, KmvSnapshot](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[TokArrival], state: GroupState[KmvState]) =>
          val set = scala.collection.mutable.TreeSet.empty[Long]
          state.getOption.foreach(s => set ++= s.hashes)
          // bounded insert (the kmvTokenSketch pattern): a hash above the
          // current k-th smallest never enters the set, so per-batch
          // memory stays k longs — not O(batch distinct)
          rows.foreach { t =>
            if (set.size < k) { set.add(t.hval): Unit }
            else if (t.hval < set.last) {
              set.add(t.hval)
              if (set.size > k) { set.remove(set.last): Unit }
            }
          }
          val seq = state.getOption.map(_.seq).getOrElse(0L) + 1L
          val arr = set.toArray // ascending: TreeSet iteration order
          state.update(KmvState(arr, seq))
          Iterator.single(KmvSnapshot(grp, seq, arr))
      }
  }

  /** Bounded batch-replay (the `Replay.runSink` contract): arrivals are
    * fed in ascending `ord` chunks, one micro-batch each, so the bottom-k
    * state genuinely crosses batch boundaries through the state store.
    * Returns the FINAL snapshot per group exploded back to the batch
    * sketch layout (grp, hval, pos) — feed it to `Sketches.kmvEstimate`
    * or `kmvOverlap` unchanged.
    */
  def kmvReplay(spark: SparkSession, toks: Seq[TokArrival], chunks: Int, k: Int): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext
    val mem = MemoryStream[TokArrival]
    val out = kmvStream(mem.toDS(), k).toDF()
    val sink = Replay.runSink(spark, out)(q =>
      Replay.feedChunks(q, mem, Replay.chunked(toks.sortBy(t => (t.ord, t.hval)), chunks)))
    val w = Window.partitionBy("grp")
    sink
      .withColumn("mx", max(col("seq")).over(w))
      .where(col("seq") === col("mx"))
      .select(col("grp"), posexplode(col("hashes")).as(Seq("p0", "hval")))
      .select(col("grp"), col("hval"), (col("p0") + 1).cast("long").as("pos"))
  }

  /** Bounded batch-replay of the streaming Count-Min sketch
    * (`Sketches.cmsCellsStream`): token arrivals fed in ascending
    * event-time chunks, watermark advanced by far-future sentinels so
    * every real window CLOSES and emits in append mode, sentinel windows
    * filtered out, and the closed-window cells merged by sum — which is
    * the CMS's own merge. Because cell counters are ADDITIVE and event
    * windows partition the arrivals, the merged cells equal
    * `Sketches.cmsCells` over the same tokens EXACTLY, independent of
    * chunking — the order-independence that makes the streaming path
    * SQL-oracle-able bit-for-bit (proven at the gate by `stream_cms`).
    */
  def cmsReplay(
      spark: SparkSession,
      rows: Seq[(Long, String)],
      chunks: Int,
      depth: Int,
      width: Int,
      windowDuration: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val out = graft.ext.Sketches.cmsCellsStream(
      mem.toDF().toDF("t", "wd"), "t", "wd", depth, width, windowDuration,
      watermarkDelay = "0 seconds")
    val maxTs = rows.map(_._1).max
    val sink = Replay.runSink(spark, out) { q =>
      Replay.feedChunks(q, mem,
        Replay.chunked(rows.sortBy(identity), chunks)
          .map(_.map { case (t, wd) => (new java.sql.Timestamp(t), wd) }))
      Replay.flushSentinels[(java.sql.Timestamp, String)](
        q, Seq(mem), maxTs, ts => (new java.sql.Timestamp(ts), "_sentinel_"))
    }
    sink
      .where(col("window.start") <= new java.sql.Timestamp(maxTs))
      .groupBy("row_idx", "col_idx")
      .agg(sum("cnt").as("cnt"))
  }

  /** [[cmsReplay]]'s per-WINDOW sibling: same feed/sentinel/close
    * mechanics, but closed windows are kept separate instead of merged —
    * the shape `Sketches.distributionDrift` consumes (window_start in
    * epoch ms, bucket, count). depth is pinned to 1: a drift monitor
    * wants one histogram per window, not CMS redundancy.
    */
  def cmsWindowReplay(
      spark: SparkSession,
      rows: Seq[(Long, String)],
      chunks: Int,
      width: Int,
      windowDuration: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val out = graft.ext.Sketches.cmsCellsStream(
      mem.toDF().toDF("t", "wd"), "t", "wd", depth = 1, width, windowDuration,
      watermarkDelay = "0 seconds")
    val maxTs = rows.map(_._1).max
    val sink = Replay.runSink(spark, out) { q =>
      Replay.feedChunks(q, mem,
        Replay.chunked(rows.sortBy(identity), chunks)
          .map(_.map { case (t, wd) => (new java.sql.Timestamp(t), wd) }))
      Replay.flushSentinels[(java.sql.Timestamp, String)](
        q, Seq(mem), maxTs, ts => (new java.sql.Timestamp(ts), "_sentinel_"))
    }
    sink
      .where(col("window.start") <= new java.sql.Timestamp(maxTs))
      .select(
        (col("window.start").cast("long") * 1000L).as("window_start"),
        col("col_idx"), col("cnt"))
  }
}
