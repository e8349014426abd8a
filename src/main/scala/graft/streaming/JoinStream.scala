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
    */
  def intervalJoin(
      views: DataFrame,
      actions: DataFrame,
      horizonMs: Long,
      watermark: String): DataFrame =
    views.withWatermark("vTime", watermark)
      .join(
        actions.withWatermark("aTime", watermark),
        expr(s"""vKey = aKey AND
                |aTime >= vTime AND
                |aTime <= vTime + INTERVAL $horizonMs MILLISECONDS""".stripMargin))

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
      watermark: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext
    require(chunks >= 1, "need at least one chunk")
    require(views.forall(_.key != -1L) && actions.forall(_.key != -1L),
      "key -1 is reserved for the watermark-flush sentinel; remap real events first")
    val vs = views.sortBy(e => (e.tsMs, e.key))
    val as = actions.sortBy(e => (e.tsMs, e.key))
    val memV = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[JoinEvent]
    val memA = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[JoinEvent]
    val out = intervalJoin(
      memV.toDS().select(col("key").as("vKey"), timestamp_millis(col("tsMs")).as("vTime")),
      memA.toDS().select(col("key").as("aKey"), timestamp_millis(col("tsMs")).as("aTime")),
      horizonMs, watermark)
    val table = s"join_replay_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = out.writeStream.outputMode("append").format("memory").queryName(table).start()
    def chunked(s: Seq[JoinEvent]) = {
      val per = math.max(1, math.ceil(s.size.toDouble / chunks).toInt)
      s.grouped(per).toSeq
    }
    try {
      val (cv, ca) = (chunked(vs), chunked(as))
      (0 until math.max(cv.size, ca.size)).foreach { i =>
        cv.lift(i).foreach(c => memV.addData(c: _*))
        ca.lift(i).foreach(c => memA.addData(c: _*))
        q.processAllAvailable()
      }
      val flush = (vs ++ as).map(_.tsMs).maxOption.getOrElse(0L) + (1L << 40)
      memV.addData(JoinEvent(-1L, flush)); memA.addData(JoinEvent(-1L, flush))
      q.processAllAvailable()
      memV.addData(JoinEvent(-1L, flush + (1L << 40))); memA.addData(JoinEvent(-1L, flush + (1L << 40)))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(table).where(col("vKey") =!= -1L)
      .select(
        col("vKey").as("user_id"),
        unix_millis(col("vTime")).as("v_ts"),
        unix_millis(col("aTime")).as("a_ts"))
  }
}
