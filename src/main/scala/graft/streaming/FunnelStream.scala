package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One funnel-relevant event on the stream. */
final case class FunnelEvent(user: String, step: String, tsMs: Long)

/** FunnelEvent plus the watermarked event-time column. */
final case class TimedFunnelEvent(user: String, step: String, tsMs: Long, eventTime: java.sql.Timestamp)

/** Carried per-user funnel progress: steps completed so far and the
  * completion time of the last one (O(1) per user).
  */
final case class FunnelState(reached: Int, lastStepTsMs: Long)

/** Emitted when a user advances to funnel step `step` (1-based). */
final case class FunnelAdvance(user: String, step: Int, tsMs: Long)

/** Streaming twin of `Behavior.funnel`: per-user ordered-funnel progress
  * over an unbounded event stream. State is one (reached, lastTs) pair
  * per user in the state store; each micro-batch's events are processed
  * in event-time order, advancing the funnel when the NEXT step's type
  * appears strictly after the previous step's completion, and emitting a
  * `FunnelAdvance` record per transition (append-only, monotone — the
  * streaming-friendly shape; the batch operator reports the final level,
  * this one reports each level as it is reached).
  *
  * Parity contract: for a stream that is in order per user across
  * micro-batches (the spec replays one), the advances match the batch
  * `steps_reached` exactly — greedy earliest matching IS the batch
  * earliest-completion chaining. Documented divergence (same family as
  * the pct-of-max threshold, SURVEY.md §7.5): an event that arrives in a
  * later micro-batch bearing an EARLIER timestamp than an already-taken
  * step cannot retroactively lower that step's completion time, so
  * cross-batch reordering can under-report downstream steps relative to
  * a batch recompute. Dead users expire from the state store after
  * `stateTtlMs` of event time.
  */
object FunnelStream {

  def advances(
      events: Dataset[FunnelEvent],
      steps: Seq[String],
      watermarkDelay: String = "10 minutes",
      stateTtlMs: Long = 86400000L): Dataset[FunnelAdvance] = {
    require(steps.nonEmpty && steps.distinct == steps, "steps must be non-empty and distinct")
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
      .withWatermark("eventTime", watermarkDelay)
      .as[TimedFunnelEvent]
      .groupByKey(_.user)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: String, rows: Iterator[TimedFunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toArray.sortBy(e => (e.tsMs, e.step))
            var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            val out = batch.iterator.flatMap { e =>
              val eligible = st.reached < steps.length &&
                e.step == steps(st.reached) &&
                (st.reached == 0 || e.tsMs > st.lastStepTsMs)
              if (eligible) {
                st = FunnelState(st.reached + 1, e.tsMs)
                Iterator.single(FunnelAdvance(user, st.reached, e.tsMs))
              } else Iterator.empty
            }.toVector
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.lastStepTsMs + stateTtlMs, state.getCurrentWatermarkMs + 1))
            out.iterator
          }
      }
  }
}
