package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming shot-boundary detection — the live twin of
  * `Multimodal.sceneCuts`: per-frame fixed-point feature vectors arrive
  * as a stream (the demux+decode stage emits them as frames are read),
  * and each video's cut decisions are made ON ARRIVAL against one piece
  * of custom state: the previous frame's vector. State is a single
  * (lastFrameIdx, lastVm) pair per live video — O(dims) longs,
  * independent of video length, the streaming-native shape of a
  * sequential recurrence (same contract as the EMA monitor's per-series
  * state).
  *
  * Ordering contract: transitions are computed between CONSECUTIVE
  * sampled frames, so arrivals are processed in frameIdx order within
  * each micro-batch (sorted per group per batch — bounded by that
  * video's frames in the batch), and a frame at-or-below the state's
  * lastFrameIdx is DROPPED, not retro-inserted: computing the cut it
  * would have created needs the frame that followed it, which the state
  * no longer holds. Feed demux order (the natural order of a video
  * decoder) for exact batch parity — proven by the replay spec.
  */
object SceneCutStream {

  /** One decoded frame: 4-dp fixed-point grid-embedding components
    * (`floor(value·10⁴ + 0.5)` — `Multimodal.pooledVideoEmbedding`'s
    * grid), ascending dim order.
    */
  final case class FrameArrival(videoId: Long, frameIdx: Long, vm: Array[Long])

  /** Per-video state: the previous sampled frame. */
  final case class CutState(lastIdx: Long, lastVm: Array[Long])

  /** Per-transition emission (every transition, cut or not — consumers
    * threshold downstream or read `isCut`).
    */
  final case class CutEvent(videoId: Long, frameIdx: Long, l1Fp: Long, isCut: Boolean)

  /** Eviction contract: "per live video" is made finite by a
    * processing-time idle horizon — a video that has produced no frame
    * for `idleEvictMs` is considered ENDED and its state is removed
    * (total state = one CutState per video seen in the last horizon, not
    * per video ever). A frame arriving after eviction is treated as a
    * NEW video's frame 0: its first transition is unobservable because
    * the previous vector is gone — the same contract as the watermark
    * eviction in `NearDupStream`, stated instead of unbounded.
    *
    * `idleEvictMs <= 0` disables eviction (NoTimeout) — for the BOUNDED
    * replay/verification harness only: with ProcessingTimeTimeout the
    * engine keeps scheduling micro-batches to check timers
    * (`shouldRunAnotherBatch` is unconditionally true), which is correct
    * in a real deployment and incompatible with the harness's
    * `processAllAvailable` barrier (it would never settle). A production
    * `readStream` should always run with a positive horizon.
    */
  def cutsStream(
      arrivals: Dataset[FrameArrival],
      tauFp: Long,
      idleEvictMs: Long = 3600000L): Dataset[CutEvent] = {
    require(tauFp >= 0, s"tauFp must be >= 0, got $tauFp")
    import arrivals.sparkSession.implicits._
    arrivals
      .groupByKey(_.videoId)
      .flatMapGroupsWithState[CutState, CutEvent](
        OutputMode.Append,
        if (idleEvictMs > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (vid: Long, rows: Iterator[FrameArrival], state: GroupState[CutState]) =>
          if (state.hasTimedOut) {
            // idle past the horizon: the video is over — drop its state
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toArray.sortBy(_.frameIdx)
            var last = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer.empty[CutEvent]
            sorted.foreach { f =>
              if (last != null && f.frameIdx > last.lastIdx) {
                val n = math.min(f.vm.length, last.lastVm.length)
                var l1 = 0L
                var i = 0
                while (i < n) { l1 += math.abs(f.vm(i) - last.lastVm(i)); i += 1 }
                out += CutEvent(vid, f.frameIdx, l1, l1 >= tauFp)
              }
              if (last == null || f.frameIdx > last.lastIdx) last = CutState(f.frameIdx, f.vm)
            }
            if (last != null) {
              state.update(last)
              if (idleEvictMs > 0) state.setTimeoutDuration(idleEvictMs)
            }
            out.iterator
          }
      }
  }

  /** Bounded batch-replay for the driver oracle: arrivals feed in
    * (videoId, frameIdx)-ordered chunks, one micro-batch each, so state
    * genuinely crosses micro-batch boundaries mid-video. Returns CUT
    * rows only — (doc_id, frame_idx, l1_fp), `Multimodal.sceneCuts`'
    * exact output contract, so the batch oracle replays unchanged.
    */
  def cutsReplay(
      arrivals: Seq[FrameArrival],
      spark: org.apache.spark.sql.SparkSession,
      chunks: Int,
      tauFp: Long): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext
    val sorted = arrivals.sortBy(a => (a.videoId, a.frameIdx))
    val mem = MemoryStream[FrameArrival]
    // harness mode: eviction off so processAllAvailable can settle (see
    // cutsStream doc) — the replay is bounded and drains every chunk
    val out = cutsStream(mem.toDS(), tauFp, idleEvictMs = 0L)
    Replay.runSink(spark, out.toDF())(q => Replay.feedChunks(q, mem, Replay.chunked(sorted, chunks)))
      .where(col("isCut"))
      .select(
        col("videoId").as("doc_id"),
        col("frameIdx").as("frame_idx"),
        col("l1Fp").as("l1_fp"))
  }
}
