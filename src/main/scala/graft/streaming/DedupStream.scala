package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-time form of `Dedup.exact`:
  * an unbounded document stream is deduplicated on a content hash with
  * `dropDuplicatesWithinWatermark`, so the FIRST arrival of each hash
  * passes through and every duplicate seen while its key is within the
  * watermark horizon is dropped. State is one (hash → latest event time)
  * entry per distinct document in the horizon, evicted by watermark — the
  * always-on filter in front of a training-data lake, where re-crawls and
  * mirror feeds deliver the same document days apart.
  *
  * The watermark bounds BOTH state size and the dedup guarantee: a
  * duplicate arriving later than the delay can re-emit (its state was
  * evicted) — the documented batch/stream divergence, the streaming
  * analogue of the TTL note on `MonitorStream`. Size the delay to the
  * feed's re-delivery window.
  */
object DedupStream {

  /** One document arrival: synthetic event time + content hash columns
    * are built by the caller (`hash = md5(text)` for exact dedup).
    */
  final case class DocArrival(docId: Long, tsMs: Long, hash: String)

  /** The streaming operator: first-arrival-wins dedup on `hash` within
    * the watermark horizon. `eventTime` must be a TIMESTAMP column.
    */
  def dedupStream(
      df: DataFrame,
      eventTimeCol: String,
      hashCol: String,
      watermarkDelay: String): DataFrame =
    df.withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(hashCol)

  /** Bounded batch-replay for the driver oracle (same contract as
    * `Replay.monitorCfgReplay`): arrivals are fed in ascending `docId`
    * chunks, one micro-batch each, so dedup state genuinely crosses
    * micro-batch boundaries in the state store. Each chunk is added in
    * ascending docId order through a single in-memory partition, so
    * within a batch the earliest docId of a hash is the row the state
    * store sees first — making the survivor set deterministic: the
    * minimum docId per hash. Replay-scale inputs only (MemoryStream is
    * driver-resident by contract); production uses `dedupStream` over a
    * readStream source unchanged.
    */
  def dedupReplay(
      arrivals: Seq[DocArrival],
      spark: org.apache.spark.sql.SparkSession,
      chunks: Int,
      watermarkDelay: String = "3650 days"): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext
    val sorted = arrivals.sortBy(_.docId)
    val mem = MemoryStream[DocArrival]
    val out = dedupStream(
      mem.toDS().select(
        col("docId"), col("tsMs"),
        timestamp_millis(col("tsMs")).as("eventTime"), col("hash")),
      "eventTime", "hash", watermarkDelay)
    Replay.runSink(spark, out)(q => Replay.feedChunks(q, mem, Replay.chunked(sorted, chunks)))
      .select(col("docId").as("doc_id"), col("tsMs").as("ts_ms"), col("hash"))
  }
}
