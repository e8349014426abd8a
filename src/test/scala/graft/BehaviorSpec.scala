package graft

import graft.ext.Behavior
import org.scalatest.funsuite.AnyFunSuite

/** Funnel + retention semantics: strictly-after step chaining, null
  * propagation past the last reached step, cohort/day-offset arithmetic,
  * and determinism under repartitioning.
  */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("behavior-spec")
  import spark.implicits._

  // u1 completes a→b→c; u2 has b BEFORE its first a (must not count);
  // u3 only a; u4 never does a (absent from the result); u5 does a then
  // two b's (earliest wins) and c BETWEEN them (before s2 → not counted).
  private lazy val ev = Seq(
    ("u1", "a", 100L), ("u1", "b", 200L), ("u1", "c", 300L),
    ("u2", "b", 50L), ("u2", "a", 100L), ("u2", "b", 100L),
    ("u3", "a", 10L),
    ("u4", "x", 10L),
    ("u5", "a", 10L), ("u5", "c", 15L), ("u5", "b", 20L), ("u5", "b", 30L)
  ).toDF("user_id", "event_type", "ts_ms")

  private def funnelMap = Behavior.funnel(ev, "user_id", "event_type", "ts_ms", Seq("a", "b", "c"))
    .collect()
    .map(r => r.getAs[String]("user_id") ->
      (Option(r.getAs[java.lang.Long]("s1_ms")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("s2_ms")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("s3_ms")).map(_.toLong),
        r.getAs[Long]("steps_reached")))
    .toMap

  test("funnel: full completion, earliest times, strictly-after chaining") {
    val got = funnelMap
    assert(got("u1") == ((Some(100L), Some(200L), Some(300L), 3L)))
  }

  test("funnel: step events at or before the previous step do not count") {
    val got = funnelMap
    // u2's b@50 is before a@100 and b@100 is NOT strictly after → stuck at 1
    assert(got("u2") == ((Some(100L), None, None, 1L)))
    // u5's c@15 is before its s2=20 → steps_reached 2, s3 null
    assert(got("u5") == ((Some(10L), Some(20L), None, 2L)))
  }

  test("funnel: users without step 1 are absent; step-1-only users reach 1") {
    val got = funnelMap
    assert(!got.contains("u4"))
    assert(got("u3") == ((Some(10L), None, None, 1L)))
  }

  test("funnel is deterministic under repartitioning") {
    val a = Behavior.funnel(ev.repartition(7), "user_id", "event_type", "ts_ms", Seq("a", "b", "c"))
      .orderBy("user_id").collect().toSeq
    val b = Behavior.funnel(ev.repartition(2), "user_id", "event_type", "ts_ms", Seq("a", "b", "c"))
      .orderBy("user_id").collect().toSeq
    assert(a == b)
  }

  test("topPaths: ordered per-session sequences, counts, deterministic ties") {
    val gap = 1000L
    val e = Seq(
      // u1 session 1: a→b; u1 session 2 (gap > 1000): a→b
      (1L, "u1", "a", 0L), (2L, "u1", "b", 10L),
      (3L, "u1", "a", 5000L), (4L, "u1", "b", 5010L),
      // u2: a→b (one session)
      (5L, "u2", "a", 0L), (6L, "u2", "b", 999L),
      // u3: b→a — order matters, distinct path
      (7L, "u3", "b", 0L), (8L, "u3", "a", 1L)
    ).toDF("event_id", "user_id", "event_type", "ts_ms")
    val got = Behavior.topPaths(e, "user_id", "event_type", "ts_ms", "event_id", gap, k = 10)
      .collect()
      .map(r => r.getAs[String]("path") -> (r.getAs[Long]("n_sessions"), r.getAs[Long]("rank")))
      .toMap
    assert(got("a->b") == ((3L, 1L)))
    assert(got("b->a") == ((1L, 2L)))
    assert(got.size == 2)
  }

  test("dauWau: trailing-7-day distinct union, day-range trim, stickiness bounds") {
    val day = 86400000L
    // u1 active days 0 and 8; u2 active day 1 only
    val e = Seq(
      ("u1", 0L), ("u1", 10L), // same-day dup counts once
      ("u1", 8 * day),
      ("u2", day + 5)
    ).toDF("user_id", "ts_ms")
    val got = Behavior.dauWau(e, "user_id", "ts_ms")
      .collect()
      .map(r => r.getAs[Long]("day") -> (r.getAs[Long]("dau"), r.getAs[Long]("wau")))
      .toMap
    assert(got(0L) == ((1L, 1L)), "day 0: u1 only; trailing window holds u1 only")
    assert(got(1L) == ((1L, 2L)), "day 1: u2 active; trailing 7 days saw u1 and u2")
    assert(got(8L) == ((1L, 1L)), "day 8: u1 returns; day-1 activity aged out of the window")
    // only days with DAU > 0 are emitted (inner join), window never exceeds range
    assert(got.keySet == Set(0L, 1L, 8L))
    assert(got.values.forall { case (d, w) => d <= w })
  }

  test("retention: cohort day from first event, distinct users per offset") {
    val day = 86400000L
    val e = Seq(
      // u1 first on day 0, active days 0, 1, 1 (dup), 3
      ("u1", 10L), ("u1", day + 1), ("u1", day + 2), ("u1", 3 * day),
      // u2 first on day 1, active days 1 and 2
      ("u2", day + 5), ("u2", 2 * day + 5),
      // u3 first on day 0, active day 0 only
      ("u3", 20L)
    ).toDF("user_id", "ts_ms")
    val got = Behavior.retention(e, "user_id", "ts_ms")
      .collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) -> r.getAs[Long]("n_users"))
      .toMap
    assert(got == Map(
      (0L, 0L) -> 2L, // u1, u3 day-0 cohort size
      (0L, 1L) -> 1L, // u1 (dup same-day activity counted once)
      (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, // u2
      (1L, 1L) -> 1L))
  }
}
