package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming NEAR-dup deduplication — the ingest-time form of SimHash
  * dedup: each arriving document is fingerprinted with the same 60-bit
  * SimHash the batch path uses (`Dedup.simhash60`, computed in-stream by
  * a stateless mapPartitions — no state, no shuffle), then
  * first-arrival-wins dedup runs on the SIGNATURE with
  * `dropDuplicatesWithinWatermark`. Documents whose token multisets
  * majority-vote to the same fingerprint (exact dups, re-crawls with
  * trivial whitespace/ordering noise, boilerplate mirrors) collapse at
  * ingest, before they ever reach the lake — the streaming complement to
  * the batch `simhashPairs` + clusters pipeline, which still handles the
  * within-Hamming-distance band that distinct signatures can't catch.
  *
  * Semantics note (the honest contract): signature EQUALITY is the
  * streaming-safe fraction of near-dup — it needs one state entry per
  * distinct signature and no pairwise compare. Hamming-distance ≤ k
  * matching is NOT streaming-safe (it needs banded candidate joins
  * against all retained state); corpora needing it run the batch path on
  * what this filter lets through. State size = one (signature → latest
  * event time) entry per distinct surviving fingerprint inside the
  * watermark horizon, evicted by watermark — same bounds as
  * `DedupStream`.
  */
object NearDupStream {

  /** One document arrival for the replay harness. */
  final case class DocEvent(docId: Long, tsMs: Long, text: String)

  /** The streaming operator: in-stream SimHash + first-arrival-wins
    * dedup on the signature within the watermark horizon. Input columns
    * (idCol: long, eventTimeCol: timestamp, textCol: string); output
    * keeps (id, eventTime, simhash) for the surviving first arrivals.
    */
  def nearDupStream(
      df: DataFrame,
      idCol: String,
      eventTimeCol: String,
      textCol: String,
      watermarkDelay: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sig = df
      .select(
        col(idCol).cast("long").as("id"),
        col(eventTimeCol).cast("timestamp").as("eventTime"),
        col(textCol).as("text"))
      .as[(Long, java.sql.Timestamp, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val counts = new Array[Int](60)
        it.map { case (id, ts, text) =>
          (id, ts, graft.ext.Dedup.simhash60(md, counts, text))
        }
      }
      .toDF("id", "eventTime", "simhash")
    sig
      .withWatermark("eventTime", watermarkDelay)
      .dropDuplicatesWithinWatermark("simhash")
  }

  /** Bounded batch-replay for the driver oracle (the `DedupStream`
    * contract): arrivals feed in ascending docId chunks, one micro-batch
    * each, through a single in-memory partition — so the state store
    * always sees a signature's minimum docId first and the survivor set
    * is deterministic: min docId per signature. Replay-scale inputs
    * only; production uses `nearDupStream` over a readStream source
    * unchanged.
    */
  def nearDupReplay(
      arrivals: Seq[DocEvent],
      spark: org.apache.spark.sql.SparkSession,
      chunks: Int,
      watermarkDelay: String = "3650 days"): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext
    val sorted = arrivals.sortBy(_.docId)
    val mem = MemoryStream[DocEvent]
    val out = nearDupStream(
      mem.toDS().select(
        col("docId"), timestamp_millis(col("tsMs")).as("eventTime"), col("text")),
      "docId", "eventTime", "text", watermarkDelay)
    Replay.runSink(spark, out)(q => Replay.feedChunks(q, mem, Replay.chunked(sorted, chunks)))
      .select(
        col("id").as("doc_id"),
        unix_millis(col("eventTime")).as("ts_ms"),
        col("simhash"))
  }
}
