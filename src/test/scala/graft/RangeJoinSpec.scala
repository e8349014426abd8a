package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("range-join-spec")
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bucketized interval join equals the naive BETWEEN join; no nested-loop in the plan") {
    val ev = Tables.events(spark, sf).select(col("user_id"), col("ts_ms"))
    val win = ev.groupBy("user_id")
      .agg(min("ts_ms").as("w_start"), (min("ts_ms") + expr("(max(ts_ms) - min(ts_ms)) DIV 2")).as("w_end"))
      .withColumn("wid", lit("first-half"))
    val bucketized = RangeJoin
      .intervalJoin(ev, "ts_ms", win, "w_start", "w_end", Seq("user_id"), bucketMs = 21600000L)
      .select("user_id", "ts_ms", "wid")
    val naive = ev.join(win, Seq("user_id"))
      .where(col("ts_ms") >= col("w_start") && col("ts_ms") <= col("w_end"))
      .select("user_id", "ts_ms", "wid")
    assert(bucketized.count() == naive.count() && naive.count() > 0)
    assert(bucketized.exceptAll(naive).isEmpty && naive.exceptAll(bucketized).isEmpty)

    val p = bucketized.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$p")
  }

  test("degenerate intervals (end < start) match nothing instead of iterating backwards") {
    val pts = Seq((1L, 100L)).toDF("k", "ts")
    val iv = Seq((1L, 500L, 400L)).toDF("k", "s", "e")
    val out = RangeJoin.intervalJoin(pts, "ts", iv, "s", "e", Seq("k"), bucketMs = 10L)
    assert(out.count() == 0)
  }

  test("an input already carrying the reserved _b column is rejected loudly") {
    val pts = Seq((1L, 100L, 0L)).toDF("k", "ts", "_b")
    val iv = Seq((1L, 0L, 200L)).toDF("k", "s", "e")
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(pts, "ts", iv, "s", "e", Seq("k"), bucketMs = 10L)
    }
    assert(ex.getMessage.contains("_b"))
  }

  test("interval spanning many buckets still matches each point exactly once") {
    val pts = Seq((1L, 5L), (1L, 95L), (1L, 50L)).toDF("k", "ts")
    val iv = Seq((1L, 0L, 100L)).toDF("k", "s", "e") // spans 11 buckets at width 10
    val out = RangeJoin.intervalJoin(pts, "ts", iv, "s", "e", Seq("k"), bucketMs = 10L)
    assert(out.count() == 3, "one match per point — bucket replication must not duplicate")
  }

  test("overlapJoin: pairs sharing many buckets are emitted exactly once") {
    val a = Seq((1L, 10L, 0L, 95L)).toDF("k", "aid", "as_", "ae") // spans 10 buckets
    val b = Seq((1L, 20L, 50L, 200L)).toDF("k", "bid", "bs", "be") // overlaps in 5 of them
    val out = RangeJoin.overlapJoin(a, "as_", "ae", b, "bs", "be", Seq("k"), bucketMs = 10L)
    assert(out.count() == 1, "multi-bucket co-occurrence must not duplicate the pair")
  }

  test("overlapJoin: closed-interval semantics — touching endpoints overlap, disjoint do not") {
    val a = Seq((1L, 10L, 0L, 50L), (1L, 11L, 0L, 49L)).toDF("k", "aid", "as_", "ae")
    val b = Seq((1L, 20L, 50L, 60L)).toDF("k", "bid", "bs", "be")
    val got = RangeJoin.overlapJoin(a, "as_", "ae", b, "bs", "be", Seq("k"), bucketMs = 10L)
      .collect().map(_.getAs[Long]("aid")).toSeq
    assert(got == Seq(10L), "a.end == b.start must match; a.end == b.start - 1 must not")
  }

  test("overlapJoin equals the naive overlap theta-join on a dense random set") {
    val rng = new scala.util.Random(7)
    val a = (1 to 120).map { i =>
      val s = rng.nextInt(1000).toLong; (i.toLong % 3, i.toLong, s, s + rng.nextInt(80))
    }.toDF("k", "aid", "as_", "ae")
    val b = (1 to 120).map { i =>
      val s = rng.nextInt(1000).toLong; (i.toLong % 3, i.toLong, s, s + rng.nextInt(80))
    }.toDF("k", "bid", "bs", "be")
    val fast = RangeJoin.overlapJoin(a, "as_", "ae", b, "bs", "be", Seq("k"), bucketMs = 64L)
      .select("k", "aid", "bid")
    val naive = a.join(b, Seq("k"))
      .where(col("as_") <= col("be") && col("bs") <= col("ae"))
      .select("k", "aid", "bid")
    assert(naive.count() > 0)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("overlapJoin rejects shared non-key columns and same-name interval columns") {
    val a = Seq((1L, 0L, 10L, "x")).toDF("k", "s1", "e1", "shared")
    val b = Seq((1L, 0L, 10L, "y")).toDF("k", "s2", "e2", "shared")
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.overlapJoin(a, "s1", "e1", b, "s2", "e2", Seq("k"), 10L)
    }
    assert(ex.getMessage.contains("shared"))
    val ex2 = intercept[IllegalArgumentException] {
      RangeJoin.overlapJoin(
        a.select("k", "s1", "e1"), "s1", "e1",
        b.select(col("k"), col("s2").as("s1"), col("e2")), "s1", "e2", Seq("k"), 10L)
    }
    assert(ex2.getMessage.contains("distinct names"))
  }
}
