package graft

import graft.ext.Sessionize
import org.scalatest.funsuite.AnyFunSuite

/** Gap-based sessionization: boundary semantics (≤ gap stays, > gap
  * splits), tie determinism, rollup arithmetic, and the one-Exchange
  * plan shape both windows are supposed to share.
  */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("sessionize-spec")
  import spark.implicits._

  private val gap = 1000L

  // u1: gaps of exactly 1000 (stays), 1001 (splits), 500 (stays).
  // u2: single event. u3: two events at the SAME ts (tie-broken by id).
  private lazy val ev = Seq(
    (10L, "u1", 0L), (11L, "u1", 1000L), (12L, "u1", 2001L), (13L, "u1", 2501L),
    (20L, "u2", 42L),
    (31L, "u3", 7L), (30L, "u3", 7L)
  ).toDF("event_id", "user_id", "ts_ms")

  test("session boundaries: <= gap continues, > gap starts a new session") {
    val got = Sessionize.assign(ev, "user_id", "ts_ms", "event_id", gap)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq")).toMap
    assert(got(10L) == 1L && got(11L) == 1L, "gap == gapMs must NOT split")
    assert(got(12L) == 2L, "gap == gapMs+1 must split")
    assert(got(13L) == 2L)
    assert(got(20L) == 1L, "singleton key gets session 1")
    assert(got(30L) == 1L && got(31L) == 1L, "same-ts events share a session")
  }

  test("stats rollup: bounds, duration, counts per (key, session)") {
    val got = Sessionize.stats(ev, "user_id", "ts_ms", "event_id", gap)
      .collect()
      .map(r => (r.getAs[String]("user_id"), r.getAs[Long]("session_seq")) ->
        (r.getAs[Long]("session_start"), r.getAs[Long]("session_end"),
          r.getAs[Long]("duration_ms"), r.getAs[Long]("n_events"))).toMap
    assert(got.size == 4)
    assert(got(("u1", 1L)) == ((0L, 1000L, 1000L, 2L)))
    assert(got(("u1", 2L)) == ((2001L, 2501L, 500L, 2L)))
    assert(got(("u2", 1L)) == ((42L, 42L, 0L, 1L)))
    assert(got(("u3", 1L)) == ((7L, 7L, 0L, 2L)))
  }

  test("assign is deterministic under shuffled input order (tie column)") {
    val a = Sessionize.assign(ev.repartition(7), "user_id", "ts_ms", "event_id", gap)
      .orderBy("event_id").collect().toSeq
    val b = Sessionize.assign(ev.repartition(3), "user_id", "ts_ms", "event_id", gap)
      .orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("plan shape: both windows share ONE hash exchange; rollup adds one partial-agg shuffle") {
    val assignPlan = Sessionize.assign(ev, "user_id", "ts_ms", "event_id", gap)
      .queryExecution.executedPlan.toString
    assert("(?<!Broadcast)Exchange ".r.findAllIn(assignPlan).size == 1,
      s"lag + running-sum windows must reuse one hashpartitioning(user_id):\n$assignPlan")
    val statsPlan = Sessionize.stats(ev, "user_id", "ts_ms", "event_id", gap)
      .queryExecution.executedPlan.toString
    assert("(?<!Broadcast)Exchange ".r.findAllIn(statsPlan).size <= 2,
      s"rollup may add at most one more exchange:\n$statsPlan")
  }
}
