package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the attribution workload (view ⋈
  * action-within-horizon) as a genuine two-unbounded-sides join, the last
  * streaming join shape the engine was missing: stream-STATIC enrichment
  * is a plain broadcast, but stream-STREAM requires the state store to
  * buffer both sides until the watermark proves no more matches can
  * arrive.
  *
  * The join condition carries BOTH a key equality (state partitioning)
  * and a bounded time range (state cleanup): `a.ts ∈ [v.ts, v.ts +
  * horizon]` tells Spark exactly when a buffered view/action can be
  * evicted — without the range the state would grow forever. Output is
  * append-mode: a pair emits once, when formed; state size is
  * O(events within watermark + horizon) per side regardless of stream
  * length.
  */
object JoinStream {

  /** One arrival on either side for `joinReplay`. */
  final case class JoinEvent(key: Long, tsMs: Long)

  /** views(vKey, vTime: timestamp) ⋈ actions(aKey, aTime: timestamp) on
    * key equality with aTime in [vTime, vTime + horizonMs].
    *
    * `joinType` "inner" emits pairs as they form; "left_outer" ALSO emits
    * each unmatched view with null action columns once the watermark
    * proves no action can still arrive in its horizon — the
    * attribution-LOSS report (which views never converted), produced with
    * the same bounded state as the inner join. "full_outer" completes
    * the taxonomy: BOTH sides' expiring unmatched state emits with nulls
    * — unconverted views AND orphaned actions (activity with no
    * preceding view: broken tracking, direct traffic) in one pass, same
    * bounded state.
    */
  def intervalJoin(
      views: DataFrame,
      actions: DataFrame,
      horizonMs: Long,
      watermark: String,
      joinType: String = "inner"): DataFrame =
    views.withWatermark("vTime", watermark)
      .join(
        actions.withWatermark("aTime", watermark),
        expr(s"""vKey = aKey AND
                |aTime >= vTime AND
                |aTime <= vTime + INTERVAL $horizonMs MILLISECONDS""".stripMargin),
        joinType)

  /** Bounded batch-replay for the driver oracle (the dedupReplay /
    * sessionReplay contract): both sides feed MemoryStreams in ts-ordered
    * chunks — pairs genuinely form across micro-batch boundaries from
    * buffered state — then far-future sentinels flush both watermarks.
    * Output must equal the batch interval join on the same rows.
    */
  def joinReplay(
      views: Seq[JoinEvent],
      actions: Seq[JoinEvent],
      spark: org.apache.spark.sql.SparkSession,
      chunks: Int,
      horizonMs: Long,
      watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext
    require(views.forall(_.key != -1L) && actions.forall(_.key != -1L),
      "key -1 is reserved for the watermark-flush sentinel; remap real events first")
    val vs = views.sortBy(e => (e.tsMs, e.key))
    val as = actions.sortBy(e => (e.tsMs, e.key))
    val memV = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[JoinEvent]
    val memA = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[JoinEvent]
    val out = intervalJoin(
      memV.toDS().select(col("key").as("vKey"), timestamp_millis(col("tsMs")).as("vTime")),
      memA.toDS().select(col("key").as("aKey"), timestamp_millis(col("tsMs")).as("aTime")),
      horizonMs, watermark, joinType)
    Replay.runSink(spark, out) { q =>
      val (cv, ca) = (Replay.chunked(vs, chunks), Replay.chunked(as, chunks))
      (0 until math.max(cv.size, ca.size)).foreach { i =>
        cv.lift(i).foreach(c => memV.addData(c: _*))
        ca.lift(i).foreach(c => memA.addData(c: _*))
        q.processAllAvailable()
      }
      // both sides must advance: the join's effective watermark is the MIN
      // over inputs, and the outer side only emits null-matches once it
      // passes vTime + horizon
      Replay.flushSentinels(q, Seq(memV, memA),
        (vs ++ as).map(_.tsMs).maxOption.getOrElse(0L), ts => JoinEvent(-1L, ts))
      // under full_outer the sentinel rows themselves expire unmatched and
      // would emit; the filter below drops them on EITHER side (a real
      // key is never null on both sides of an emitted row)
    }.where(coalesce(col("vKey"), col("aKey")) =!= -1L
        && coalesce(col("aKey"), col("vKey")) =!= -1L)
      .select(
        coalesce(col("vKey"), col("aKey")).as("user_id"),
        unix_millis(col("vTime")).as("v_ts"),
        unix_millis(col("aTime")).as("a_ts"))
  }
}
