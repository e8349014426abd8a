package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over an event stream: ordered-funnel conversion
  * and cohort retention — the two queries every product/telemetry
  * pipeline runs at warehouse scale, and (for training-data work) the
  * standard shape for "did this agent/user complete the k-step task"
  * trajectory labeling.
  *
  * Both are pure relational compositions — aggregations and equi-joins
  * on the user key — so Catalyst plans partial aggregation and AQE-sized
  * shuffles, and every join is on the SAME key (`user`), letting the
  * exchanges reuse one hash partitioning across stages.
  */
object Behavior {

  /** Ordered funnel: for each user, the earliest completion time of each
    * step, where step i+1 must occur STRICTLY AFTER the user's earliest
    * step-i completion. Emits one row per user who completed step 1:
    * `(user, s1_ms, s2_ms, …, steps_reached)` with nulls past the last
    * reached step. "Earliest completion" semantics (not "any ordered
    * subsequence") make the result unique and engine-independent.
    *
    * Shape: one filtered aggregation per step, chained by equi-joins on
    * the user key — k−1 hash joins all on the same key, so after the
    * first exchange every stage is co-partitioned. The per-step aggregate
    * input is pre-filtered to that step's event type (pushed to the
    * scan), so each join side is tiny relative to the stream. This is
    * the scalable alternative to a per-user sort + sequential scan: no
    * per-user state, no wide rows, no skew sensitivity beyond the joins'
    * AQE handling.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, "funnel steps must be distinct")
    // each step adds a join stage; a pathological step list would build
    // an unplannable k-join tree — real funnels are short, so cap it
    // (longer sequences belong to the path-mining kernel, not chained
    // joins)
    require(steps.size <= 16, s"funnel supports at most 16 steps, got ${steps.size}")
    val s1 = events
      .where(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("s1_ms"))
    val joined = steps.zipWithIndex.tail.foldLeft(s1) { case (acc, (step, i)) =>
      val prev = s"s${i}_ms"
      val cur = s"s${i + 1}_ms"
      val nxt = events
        .where(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("_t"))
      acc
        .join(nxt, Seq(userCol), "left")
        .groupBy((col(userCol) +: (1 to i).map(j => col(s"s${j}_ms"))): _*)
        .agg(min(when(col("_t") > col(prev), col("_t"))).as(cur))
    }
    // fold ascending so the HIGHEST reached step is the outermost branch
    val reached = steps.indices.foldLeft(lit(0L)) { case (els, i) =>
      when(col(s"s${i + 1}_ms").isNotNull, lit((i + 1).toLong)).otherwise(els)
    }
    joined.withColumn("steps_reached", reached)
  }

  /** Top-k session paths: the event-type sequence of each session
    * (gap-based, via `Sessionize.assign`) concatenated in time order,
    * counted across the corpus — the "what do users actually do" mining
    * query. The per-session collect is bounded by the session gap (not
    * by a user's full history), so state stays small at any scale; the
    * ordered concat sorts (ts, tie, type) structs INSIDE the row, not
    * with a second window pass. Ties in count break by path ascending.
    */
  def topPaths(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      tieCol: String,
      gapMs: Long,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val sessions = Sessionize.assign(events, userCol, tsCol, tieCol, gapMs)
    val paths = sessions
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col(tsCol), col(tieCol), col(typeCol).as("t")))),
            x => x.getField("t")),
          "->").as("path"))
    // top-k as orderBy+limit → TakeOrderedAndProject (per-partition heap
    // + driver merge of k rows) — NOT a global rank window, whose single
    // partition would have to sort the whole path-counts table (path
    // cardinality approaches session count at scale). Ranks attach to
    // the ≤k survivors via a triangular broadcast self-join (k² bounded
    // by the parameter, not the data), keeping the plan free of
    // unpartitioned WindowExec nodes.
    val top = paths
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
    top.as("a")
      .join(
        broadcast(top.as("b")),
        col("b.n_sessions") > col("a.n_sessions") ||
          (col("b.n_sessions") === col("a.n_sessions") && col("b.path") < col("a.path")),
        "left")
      .groupBy(col("a.path").as("path"), col("a.n_sessions").as("n_sessions"))
      .agg((count(col("b.path")) + 1).as("rank"))
  }

  /** DAU / trailing-WAU stickiness per day: distinct users active that
    * day over distinct users active in the trailing 7 days. The WAU side
    * uses the explode-contribution rewrite — each (user, active-day)
    * fact contributes to the 7 target days it falls inside, then one
    * distinct count per target day — an equi-aggregation instead of the
    * quadratic self-range-join; contribution fan-out is the window
    * length, constant at any scale. Days past the observed range are
    * trimmed. All integer day arithmetic.
    */
  def dauWau(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = events
      .select(col(userCol), expr(s"CAST($tsCol DIV 86400000 AS BIGINT)").as("_day"))
      .distinct()
    val maxDay = days.agg(max("_day").as("_mx"))
    val dau = days.groupBy(col("_day").as("day")).agg(count(lit(1)).as("dau"))
    val wau = days
      .withColumn("day", explode(sequence(col("_day"), col("_day") + 6)))
      .select(col(userCol), col("day"))
      .distinct()
      .crossJoin(broadcast(maxDay))
      .where(col("day") <= col("_mx"))
      .groupBy("day")
      .agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(
        col("day"), col("dau"), col("wau"),
        round(col("dau") / col("wau").cast("double"), 4).as("stickiness"))
  }

  /** Cohort retention: users are cohorted by the epoch day of their FIRST
    * event; for each (cohort_day, day_offset) the count of distinct
    * cohort users active that day. The day-0 row is the cohort size.
    *
    * Shape: first-event aggregation (one partial-agg shuffle on user),
    * equi-join back to the stream on user (co-partitioned with the agg's
    * output), then one distinct-count aggregation on (cohort, offset,
    * user) → (cohort, offset). All integer day arithmetic — no fp, no
    * timezone: days are floor(ts_ms / 86_400_000).
    */
  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val withDay =
      events.select(col(userCol), expr(s"CAST($tsCol DIV 86400000 AS BIGINT)").as("_day"))
    val first = withDay
      .groupBy(col(userCol))
      .agg(min(col("_day")).as("cohort_day"))
    withDay
      .join(first, userCol)
      .select(col("cohort_day"), (col("_day") - col("cohort_day")).as("day_offset"), col(userCol))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
