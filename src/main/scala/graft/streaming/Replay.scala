package graft.streaming

import graft.config.DetectorConfig
import graft.model.TsSample
import org.apache.spark.sql.{DataFrame, Dataset, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Bounded batch-replay of the streaming monitor — the verification
  * harness that lets the driver's DuckDB oracle cover the Structured
  * Streaming path (`MonitorStream.monitorStreamCfg`), not just the batch
  * kernels: the input is fed through a MemoryStream in ascending
  * event-time chunks (one micro-batch per chunk, so per-key EmaState
  * genuinely carries across batch boundaries through the state store),
  * and the append-mode output is returned as a plain DataFrame.
  *
  * This is a REPLAY harness for parity checks at verification scale: the
  * chunking collects the bounded input to the driver (the same contract
  * as MemoryStream itself, whose data lives driver-side). Production
  * streams come from readStream sources and never pass through here —
  * the operator under test is unchanged either way.
  */
object Replay {

  /** Replay `points` through `monitorStreamCfg(cfg)` in ascending order
    * of `chunkKey` (e.g. the event's day), one micro-batch per chunk.
    * The state TTL defaults to effectively-infinite so the replay is a
    * pure batch-parity check (a finite TTL re-seeds the EMA after quiet
    * gaps — correct streaming hygiene, but a batch/stream divergence;
    * the TTL path is covered by StreamingSpec).
    */
  def monitorCfgReplay(
      points: Dataset[TsSample],
      cfg: DetectorConfig,
      chunkKey: TsSample => Long,
      stateTtlMs: Long = Long.MaxValue / 4): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext
    // bounded by construction: replay inputs are verification-scale
    val chunks = points.collect().groupBy(chunkKey).toSeq.sortBy(_._1)
    val mem = MemoryStream[TsSample]
    val out = MonitorStream.monitorStreamCfg(mem.toDS(), cfg, stateTtlMs)
    val table = s"replay_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(table)
      .start()
    try chunks.foreach { case (_, rows) =>
      mem.addData(rows.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(table)
  }
}
