package graft

import graft.config.{Align, BucketTs, TsQueryConfig}
import graft.ts.{TsAlgebra, TsCols}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** TS range-query algebra semantics, including the reference test-suite
  * contracts (FIXTURES.md §1: fwd/rev ordering, empty input, latest).
  */
class TsAlgebraSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("ts-algebra-spec")
  import spark.implicits._

  private val cols = TsCols(key = "k", ts = "ts", value = "v", seq = Some("seq"))

  private def df(rows: (Long, Long, Double, Long)*): DataFrame =
    rows.toSeq.toDF("k", "ts", "v", "seq")

  private val base = df(
    (1, 1000, 10.0, 1), (1, 2000, 20.0, 2), (1, 3000, 30.0, 3),
    (1, 4000, 40.0, 4), (1, 5000, 50.0, 5))

  test("forward range scan: inclusive bounds, ascending (reference fwd contract)") {
    val out = TsAlgebra
      .query(base, TsQueryConfig(fromTimeMs = Some(2000), toTimeMs = Some(4000)), cols)
      .collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2000L, 3000L, 4000L))
    assert(out.map(_.getDouble(2)).toSeq == Seq(20.0, 30.0, 40.0))
  }

  test("reversed scan returns newest first; count keeps newest N (REVRANGE contract)") {
    val out = TsAlgebra.query(base, TsQueryConfig(reversed = true, count = Some(2)), cols).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(5000L, 4000L))
  }

  test("empty input yields empty result, not an error (D16)") {
    val out = TsAlgebra.query(df(), TsQueryConfig(), cols)
    assert(out.count() == 0)
  }

  test("timestamp-set and value filters compose") {
    val out = TsAlgebra
      .query(
        base,
        TsQueryConfig(filterByTs = Some(Seq(1000L, 3000L, 5000L)), filterByMinValue = Some(25.0)),
        cols)
      .collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3000L, 5000L))
  }

  test("latest dedups duplicate timestamps by highest seq") {
    val dup = df((1, 1000, 10.0, 1), (1, 1000, 99.0, 2), (1, 2000, 20.0, 3))
    val out = TsAlgebra.query(dup, TsQueryConfig(latest = true), cols).collect()
    assert(out.length == 2)
    assert(out.find(_.getLong(1) == 1000L).get.getDouble(2) == 99.0)
  }

  test("bucketed aggregation: avg/first/last/range per half-open bucket") {
    val d = df((1, 0, 1.0, 1), (1, 500, 3.0, 2), (1, 999, 5.0, 3), (1, 1000, 7.0, 4))
    def agg(a: String) =
      TsAlgebra
        .query(d, TsQueryConfig(aggregationType = Some(a), bucketSizeMs = Some(1000)), cols)
        .collect()
        .map(r => r.getLong(1) -> r.get(2))
        .toMap
    assert(agg("avg") == Map(0L -> 3.0, 1000L -> 7.0))
    assert(agg("first") == Map(0L -> 1.0, 1000L -> 7.0))
    assert(agg("last") == Map(0L -> 5.0, 1000L -> 7.0))
    assert(agg("range") == Map(0L -> 4.0, 1000L -> 0.0))
    assert(agg("count") == Map(0L -> 3L, 1000L -> 1L))
  }

  test("align offset shifts bucket boundaries; bucket_timestamp mid relabels") {
    val d = df((1, 100, 1.0, 1), (1, 1099, 3.0, 2), (1, 1101, 5.0, 3))
    val out = TsAlgebra
      .query(
        d,
        TsQueryConfig(
          aggregationType = Some("avg"), bucketSizeMs = Some(1000),
          align = Align.At(100), bucketTimestamp = BucketTs.Mid),
        cols)
      .collect()
      .map(r => r.getLong(1) -> r.getDouble(2))
      .toMap
    // buckets [100,1100) and [1100,2100), labeled at mid (+500)
    assert(out == Map(600L -> 2.0, 1600L -> 5.0))
  }

  test("aggregation config validation mirrors the reference rules") {
    assertThrows[IllegalArgumentException](TsQueryConfig(aggregationType = Some("avg")))
    assertThrows[IllegalArgumentException](TsQueryConfig(bucketSizeMs = Some(1000)))
    assertThrows[IllegalArgumentException](
      TsQueryConfig(aggregationType = Some("p99"), bucketSizeMs = Some(1000)))
  }

  test("as-of join picks the most recent baseline at or before each point (inclusive), inner") {
    import org.apache.spark.sql.functions.col
    val pts = Seq((1L, 1000L, 10.0), (1L, 2500L, 20.0), (1L, 3000L, 30.0), (2L, 500L, 5.0))
      .toDF("seriesKey", "tsMs", "value")
    val base = Seq((1L, 1000L, 100.0), (1L, 2000L, 200.0), (2L, 600L, 50.0))
      .toDF("seriesKey", "tsMs", "baseline")
    val out = graft.ts.AsOfJoin.join(pts, base).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(out((1L, 1000L)) == 100.0) // inclusive tie
    assert(out((1L, 2500L)) == 200.0)
    assert(out((1L, 3000L)) == 200.0)
    assert(!out.contains((2L, 500L))) // no baseline at or before -> dropped (inner)
  }

  test("as-of join directions: forward inclusive, tolerance bounds the gap, nearest ties backward") {
    import graft.ts.AsOfJoin
    val pts = Seq((1L, 1000L, 10.0), (1L, 2500L, 20.0), (1L, 3000L, 30.0), (2L, 500L, 5.0))
      .toDF("seriesKey", "tsMs", "value")
    val base = Seq((1L, 1000L, 100.0), (1L, 2000L, 200.0), (2L, 600L, 50.0))
      .toDF("seriesKey", "tsMs", "baseline")
    def run(dir: String, tol: Long) =
      AsOfJoin.join(pts, base, dir, tol).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap

    val fwd = run(AsOfJoin.Forward, Long.MaxValue)
    assert(fwd((1L, 1000L)) == 100.0, "forward inclusive tie")
    assert(fwd((2L, 500L)) == 50.0, "next baseline at or after")
    assert(!fwd.contains((1L, 2500L)) && !fwd.contains((1L, 3000L)),
      "no later baseline -> dropped (inner)")

    val tol = run(AsOfJoin.Backward, 600L)
    assert(tol((1L, 2500L)) == 200.0, "gap 500 within tolerance")
    assert(!tol.contains((1L, 3000L)), "gap 1000 beyond tolerance -> dropped")
    assert(tol((1L, 1000L)) == 100.0)

    val near = run(AsOfJoin.Nearest, Long.MaxValue)
    assert(near((1L, 1000L)) == 100.0, "exact hit")
    assert(near((1L, 2500L)) == 200.0, "backward gap 500 beats no-forward")
    assert(near((2L, 500L)) == 50.0, "only forward candidate exists")
    // tie: point 3000 has backward gap 1000 (ts 2000); plant a forward
    // baseline at 4000 -> gap 1000 too; backward must win the tie
    val base2 = base.union(Seq((1L, 4000L, 400.0)).toDF("seriesKey", "tsMs", "baseline"))
    val tie = AsOfJoin.join(pts, base2, AsOfJoin.Nearest, Long.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(tie((1L, 3000L)) == 200.0, "equal gaps: backward wins")
    // tolerance shapes the eligible set BEFORE the choice: with tol 900,
    // the closer backward candidate (gap 1000) is ineligible at 3500 —
    // hypothetical; exercise via point 2500 with tol 400: backward gap
    // 500 ineligible, no forward in base -> dropped; with base2, forward
    // 4000 gap 1500 also ineligible -> still dropped
    val tight = AsOfJoin.join(pts, base2, AsOfJoin.Nearest, 400L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(!tight.contains((1L, 2500L)), "both sides out of tolerance -> dropped")
    assert(tight((1L, 1000L)) == 100.0, "gap-0 hit survives any tolerance")

    // plan pin: nearest costs ONE key exchange — the second window
    // ordering rides the same hash partitioning (extra Sort, no extra
    // shuffle). A second exchange here would double the 100 TB bill.
    val plan = AsOfJoin.join(pts, base2, AsOfJoin.Nearest, Long.MaxValue)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"nearest must reuse one key exchange, saw $exchanges:\n$plan")
  }

  test("as-of join: NULL baseline values never donate their timestamp to another row's value") {
    import graft.ts.AsOfJoin
    // the carry must treat (value, ts) as ONE unit: a NULL-valued
    // baseline row is skipped ENTIRELY, not half-skipped (value from the
    // earlier row paired with the NULL row's timestamp would shrink the
    // tolerance gap and wrongly admit the match)
    val pts = Seq((1L, 250L, 9.0)).toDF("seriesKey", "tsMs", "value")
    val baseB = Seq((1L, 100L, Some(1.0)), (1L, 200L, Option.empty[Double]))
      .toDF("seriesKey", "tsMs", "baseline")
    val b = AsOfJoin.join(pts, baseB, AsOfJoin.Backward, 60L).collect()
    assert(b.isEmpty,
      s"backward: real gap 150 > 60 must drop (value@100 + ts@200 would fake gap 50): ${b.toSeq}")
    val bWide = AsOfJoin.join(pts, baseB, AsOfJoin.Backward, 600L).collect()
    assert(bWide.map(_.getDouble(3)).toSeq == Seq(1.0), "wide tolerance matches the real non-null row")
    val baseF = Seq((1L, 300L, Option.empty[Double]), (1L, 400L, Some(2.0)))
      .toDF("seriesKey", "tsMs", "baseline")
    val f = AsOfJoin.join(pts, baseF, AsOfJoin.Forward, 60L).collect()
    assert(f.isEmpty,
      s"forward: real gap 150 > 60 must drop (value@400 + ts@300 would fake gap 50): ${f.toSeq}")
    val n = AsOfJoin.join(pts, baseB.union(baseF), AsOfJoin.Nearest, 160L).collect()
    assert(n.map(_.getDouble(3)).toSeq == Seq(1.0),
      "nearest at tol 160: both real gaps are 150; ties backward -> 1.0")
  }

  test("gapFillLinear: an all-NULL-value bucket neither brackets nor donates its timestamp") {
    // bucket 20 is PRESENT (n_points=1) but its value is NULL: the gap at
    // bucket 10 must interpolate between the REAL observations at 0 and
    // 40 (span 40), not pair value@0 with time@20 (span 20 -> wrong ramp)
    val pts = Seq(
      (1L, 0L, Some(1.0)), (1L, 20L, Option.empty[Double]), (1L, 45L, Some(9.0)))
      .toDF("user_id", "ts_ms", "value")
    val out = TsAlgebra.gapFillLinear(pts, "user_id", "ts_ms", "value", bucketMs = 10L)
      .collect().map(r => r.getLong(1) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(0L) == Some(1.0) && out(40L) == Some(9.0))
    assert(out(20L) == None, "present-but-null bucket keeps its null value")
    assert(out(10L) == Some(3.0),
      s"gap at 10 ramps over the REAL bracket 0..40: 1 + 8*10/40 = 3.0, got ${out(10L)}")
    assert(out(30L) == Some(7.0), s"gap at 30: 1 + 8*30/40 = 7.0, got ${out(30L)}")
  }

  test("gapFill emits every bucket, flags gaps, carries the last value forward") {
    // key 1: buckets 0,10 present; 20 missing; 30 present
    val pts = Seq((1L, 3L, 5.0), (1L, 12L, 7.0), (1L, 33L, 9.0), (1L, 35L, 2.0))
      .toDF("user_id", "ts_ms", "value")
    val out = TsAlgebra.gapFill(pts, "user_id", "ts_ms", "value", bucketMs = 10L)
      .collect()
      .map(r => r.getAs[Long]("ts_ms") ->
        (r.getAs[Long]("n_points"), r.getAs[Double]("value_ff"), r.getAs[Boolean]("is_gap")))
      .toMap
    assert(out.keySet == Set(0L, 10L, 20L, 30L))
    assert(out(0L) == ((1L, 5.0, false)))
    assert(out(10L) == ((1L, 7.0, false)))
    assert(out(20L) == ((0L, 7.0, true)), "gap bucket carries the last value forward")
    assert(out(30L) == ((2L, 9.0, false)), "bucket stat is max over its points")
  }

  test("movingAgg: trailing frame matches hand-computed values") {
    val rows = Seq((1L, 10L, 1.0), (1L, 20L, 3.0), (1L, 30L, 5.0), (2L, 10L, 7.0))
      .toDF("k", "t", "v")
    val out = graft.ts.TsAlgebra.movingAgg(rows, "k", "t", "v", window = 2).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("t")) ->
        ((r.getAs[Double]("mov_avg"), r.getAs[Double]("mov_min"),
          r.getAs[Double]("mov_max"), r.getAs[Long]("mov_n")))).toMap
    assert(out((1L, 10L)) == ((1.0, 1.0, 1.0, 1L)))
    assert(out((1L, 20L)) == ((2.0, 1.0, 3.0, 2L))) // avg(1,3)
    assert(out((1L, 30L)) == ((4.0, 3.0, 5.0, 2L))) // window slides off 1.0
    assert(out((2L, 10L)) == ((7.0, 7.0, 7.0, 1L)))
  }

  test("pairwiseCorr: perfectly correlated and anti-correlated series") {
    // bucket = 10; series 1 rises, series 2 rises (r=1), series 3 falls (r=-1)
    val rows = (0 until 6).flatMap { i =>
      Seq((1L, i * 10L, i.toDouble), (2L, i * 10L, 2.0 * i + 5), (3L, i * 10L, -i.toDouble))
    }.toDF("k", "t", "v")
    val out = graft.ts.TsAlgebra.pairwiseCorr(rows, "k", "t", "v", bucketMs = 10L, minBuckets = 3)
      .collect()
      .map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b")) -> r.getAs[Double]("pearson_r"))
      .toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 3L)) == -1.0)
    assert(out((2L, 3L)) == -1.0)
    assert(out.keys.forall { case (a, b) => a < b })
    // zero-variance side → Pearson undefined → NULL (the ANSI/DuckDB
    // answer), never NaN
    val withFlat = rows.union(Seq.tabulate(6)(i => (4L, i * 10L, 42.0)).toDF("k", "t", "v"))
    val flat = graft.ts.TsAlgebra.pairwiseCorr(withFlat, "k", "t", "v", bucketMs = 10L, minBuckets = 3)
      .where(org.apache.spark.sql.functions.col("key_b") === 4L).collect()
    assert(flat.nonEmpty && flat.forall(_.isNullAt(flat.head.fieldIndex("pearson_r"))))
  }

  test("pairwiseCorr fails loudly past maxSeries and points at the scale path") {
    val rows = (0 until 12).flatMap { k =>
      (0 until 4).map(i => (k.toLong, i * 10L, (k * i).toDouble))
    }.toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      graft.ts.TsAlgebra.pairwiseCorr(rows, "k", "t", "v", bucketMs = 10L, maxSeries = 10L)
    }
    assert(e.getMessage.contains("topCorrelatedPairs"), e.getMessage)
    // under the cap it still runs
    assert(graft.ts.TsAlgebra.pairwiseCorr(
      rows, "k", "t", "v", bucketMs = 10L, minBuckets = 3, maxSeries = 12L).count() > 0)
  }

  test("topCorrelatedPairs: candidate pairs carry EXACTLY pairwiseCorr's r; flatlines capped away") {
    // series 1/2 perfectly correlated (identical sign pattern), series 3
    // anti-correlated, 4..9 constant (one shared all-negative sketch — the
    // occupancy cap path at maxBucket=2) — 8 buckets, 4 bands of 2
    val rows = (0 until 8).flatMap { i =>
      val v = if (i % 2 == 0) 1.0 else -1.0
      Seq((1L, i * 10L, v * (i + 1)), (2L, i * 10L, 3 * v * (i + 1) + 7), (3L, i * 10L, -v * (i + 1))) ++
        (4L to 9L).map(k => (k, i * 10L, 42.0))
    }.toDF("k", "t", "v")
    val pruned = graft.ts.TsAlgebra.topCorrelatedPairs(
      rows, "k", "t", "v", bucketMs = 10L, minBuckets = 3,
      nBands = 4, minBandMatches = 2, minAbsR = 0.5, maxBucket = 2)
      .collect()
      .map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b")) -> r.getAs[Double]("pearson_r"))
      .toMap
    // matching sign patterns band-match; the anti-correlated pair can't
    // (its every sign bit flips); flatlined 4..9 share one signature in
    // every band (occ 6 > 2) and are capped away, not exploded
    assert(pruned.keySet == Set((1L, 2L)), s"got $pruned")
    val exact = graft.ts.TsAlgebra.pairwiseCorr(
      rows.where($"k" <= 3L), "k", "t", "v", bucketMs = 10L, minBuckets = 3)
      .collect()
      .map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b")) -> r.getAs[Double]("pearson_r"))
      .toMap
    assert(pruned((1L, 2L)) == exact((1L, 2L)), s"pruned r must equal exact r: $pruned vs $exact")
  }

  test("gapFillLinear: gaps ramp between brackets; edges fall back; present buckets keep their value") {
    // buckets at 0,10,...: observed v=10 @0 and v=40 @30 → gaps at 10,20
    // interpolate 20, 30; leading/trailing grid is span-bounded
    val rows = Seq((1L, 0L, 10.0), (1L, 30L, 40.0), (1L, 35L, 20.0)).toDF("k", "t", "v")
    val out = graft.ts.TsAlgebra.gapFillLinear(rows, "k", "t", "v", bucketMs = 10L)
      .collect()
      .map(r => r.getAs[Long]("ts_ms") -> (r.getAs[Double]("value_interp"), r.getAs[Boolean]("is_gap")))
      .toMap
    assert(out(0L) == ((10.0, false)))
    assert(out(10L) == ((20.0, true)), "1/3 of the way from 10 to 40")
    assert(out(20L) == ((30.0, true)))
    assert(out(30L) == ((40.0, false)), "bucket max of 40 and 20 is 40")
    assert(out.size == 4)
  }

  test("moments: symmetric series → zero skew; right tail → positive; constant → null") {
    val sym = (1 to 5).map(i => (1L, i.toDouble)) // 1..5 symmetric
    val tail = Seq.fill(9)((2L, 1.0)) :+ ((2L, 100.0)) // heavy right tail
    val const = Seq.fill(4)((3L, 7.0))
    val out = graft.ts.TsAlgebra.moments((sym ++ tail ++ const).toDF("k", "v"), "k", "v")
      .collect()
      .map(r => r.getAs[Long]("k") ->
        (Option(r.getAs[java.lang.Double]("skewness")), Option(r.getAs[java.lang.Double]("kurtosis_excess"))))
      .toMap
    assert(out(1L)._1.contains(0.0))
    assert(out(1L)._2.exists(k => math.abs(k - (-1.3)) < 0.01), "uniform 1..5 excess kurtosis = -1.3")
    assert(out(2L)._1.exists(_ > 2.0), "right tail must skew positive")
    assert(out(3L) == ((None, None)), "zero variance → null moments")
  }

  test("exact fixed-decimal avg rounds negative means half-away-from-zero (not toward zero)") {
    // 8 values summing to -1 cent: mean = -0.00125 $, a 4-decimal
    // half-way point; truncating DIV would give -0.0012
    val rows = ((1 to 7).map(i => (1L, i * 1000L, 0.0, i.toLong)) :+ ((1L, 8000L, -0.01, 8L)))
    val out = TsAlgebra
      .query(
        df(rows: _*),
        TsQueryConfig(
          aggregationType = Some("avg"), bucketSizeMs = Some(86400000L), valueDecimals = Some(2)),
        cols)
      .collect()
    assert(out.length == 1 && out.head.getAs[Double]("v") == -0.0013, s"got ${out.head}")
    val mov = TsAlgebra
      .movingAgg(df(rows: _*), "k", "ts", "v", window = 8, valueDecimals = Some(2))
      .orderBy(org.apache.spark.sql.functions.col("ts").desc)
      .limit(1).collect().head.getAs[Double]("mov_avg")
    assert(mov == -0.0013, s"movingAgg last frame mean must round away from zero, got $mov")
  }

  test("stlDecompose: reconstruction identity holds exactly; seasonal profile recovered; spike lands in the residual") {
    import org.apache.spark.sql.functions.col
    // clean series: period-4 pattern [0, 5, 0, -5] on a gentle ramp; a
    // SEPARATE series carries the same shape plus one injected spike
    // (keeping the profile check spike-free: a spike inflates its own
    // phase's seasonal mean by ~detrended/occurrences by construction)
    val pattern = Array(0.0, 5.0, 0.0, -5.0)
    def mk(key: String, spikeAt: Int): Seq[(String, Long, Double)] =
      (0 until 40).map { i =>
        val spike = if (i == spikeAt) 50.0 else 0.0
        (key, (i + 1) * 1000L, 10.0 + 0.25 * i + pattern(i % 4) + spike)
      }
    val rows = mk("clean", -1) ++ mk("spiked", 21)
    val all = TsAlgebra.stlDecompose(rows.toDF("k", "ts", "v"), "k", "ts", "v", period = 4)
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("ts")) ->
        ((r.getAs[Double]("v"), r.getAs[Int]("phase"), r.getAs[Long]("trend_fp"),
          r.getAs[Long]("seasonal_fp"), r.getAs[Long]("resid_fp")))).toMap
    // exact reconstruction: trend + seasonal + resid == the 4-dp value, per row
    all.foreach { case (kts, (v, _, t, s, rd)) =>
      assert(t + s + rd == math.round(v * 100) * 100, s"identity broken at $kts")
    }
    // the injected spike dominates the spiked series' residuals
    // (single-pass STL: some leakage into the spike's MA-frame neighbors
    // and its phase's seasonal mean is inherent)
    val spikeResid = math.abs(all(("spiked", 22000L))._5)
    val restMax = all.collect {
      case ((k, ts), r) if k == "spiked" && ts != 22000L => math.abs(r._5)
    }.max
    assert(spikeResid > 2.5 * restMax, s"spike resid $spikeResid vs rest max $restMax")
    // clean series: interior seasonal recovers the planted pattern and
    // residuals are small (MA edge effects only)
    (10 to 16).foreach { i =>
      val s = all(("clean", (i + 1) * 1000L))._4 / 10000.0
      assert(math.abs(s - pattern(i % 4)) < 0.5, s"phase ${i % 4}: seasonal $s vs ${pattern(i % 4)}")
    }
    val cleanInteriorMax = (4 to 35).map(i => math.abs(all(("clean", (i + 1) * 1000L))._5)).max
    assert(cleanInteriorMax < 10000L, s"clean interior residuals must stay under 1.0: $cleanInteriorMax")
    // a flat series decomposes to itself: zero seasonal, zero residual
    val flat = (0 until 12).map(i => ("flat", (i + 1) * 1000L, 7.0)).toDF("k", "ts", "v")
    TsAlgebra.stlDecompose(flat, "k", "ts", "v", period = 4).collect().foreach { r =>
      assert(r.getAs[Long]("seasonal_fp") == 0L && r.getAs[Long]("resid_fp") == 0L)
      assert(r.getAs[Long]("trend_fp") == 70000L)
    }
  }

  test("acf: matches a naive double replay; alternating series anti-correlates at odd lags") {
    // planted period-4 pattern + mild ramp; naive double-arithmetic ACF
    // (textbook formula, not the integer-algebra route) within 1e-4 + the
    // rounding grid
    val vs = (0 until 40).map(i => 10.0 + 0.1 * i + Array(0.0, 4.0, 0.0, -4.0)(i % 4))
    val rows = vs.zipWithIndex.map { case (v, i) => ("a", (i + 1) * 1000L, v) }
    def naiveAcf(xs: Seq[Double], l: Int): Double = {
      val mu = xs.sum / xs.size
      val den = xs.map(x => (x - mu) * (x - mu)).sum
      val num = (l until xs.size).map(t => (xs(t) - mu) * (xs(t - l) - mu)).sum
      num / den
    }
    val out = TsAlgebra.acf(rows.toDF("k", "ts", "v"), "k", "ts", "v", maxLag = 6)
      .collect().map(r => r.getAs[Int]("lag_k") -> r.getAs[Double]("acf")).toMap
    (1 to 6).foreach { l =>
      assert(math.abs(out(l) - naiveAcf(vs, l)) < 2e-4, s"lag $l: ${out(l)} vs ${naiveAcf(vs, l)}")
    }
    // the period-4 signature: lag 4 strongly positive, lag 2 strongly negative
    assert(out(4) > 0.5 && out(2) < -0.5)
    // alternating +/- series: lag 1 ≈ −1, lag 2 ≈ +1
    val alt = (0 until 30).map(i => ("b", (i + 1) * 1000L, if (i % 2 == 0) 1.0 else -1.0))
    val aout = TsAlgebra.acf(alt.toDF("k", "ts", "v"), "k", "ts", "v", maxLag = 2)
      .collect().map(r => r.getAs[Int]("lag_k") -> r.getAs[Double]("acf")).toMap
    assert(aout(1) < -0.9 && aout(2) > 0.9)
    // constant series: zero denominator → NULL acf, never a crash
    val const = (0 until 10).map(i => ("c", (i + 1) * 1000L, 5.0))
    val cout = TsAlgebra.acf(const.toDF("k", "ts", "v"), "k", "ts", "v", maxLag = 2).collect()
    assert(cout.length == 2 && cout.forall(_.isNullAt(3)))
    // lags >= series length are not emitted
    val short = (0 until 3).map(i => ("d", (i + 1) * 1000L, i.toDouble))
    assert(TsAlgebra.acf(short.toDF("k", "ts", "v"), "k", "ts", "v", maxLag = 6).count() == 2)
  }

  test("periodogram: a planted cosine's period dominates; matches a naive DFT; flat series → zero power") {
    val n = 96
    val planted = 8
    // on the 2-decimal grid (the operator's exact centi-int domain, like
    // the events table) so the naive replay sees the same inputs
    val vs = (0 until n).map(i => math.round((50.0 + 20.0 * math.cos(2 * math.Pi * i / planted)) * 100) / 100.0)
    val rows = vs.zipWithIndex.map { case (v, i) => ("a", (i + 1) * 1000L, v) }
    val out = TsAlgebra
      .periodogram(rows.toDF("k", "ts", "v"), "k", "ts", "v", periods = 2 to 16)
      .collect().map(r => r.getAs[Int]("period") -> r.getAs[Double]("spec_power")).toMap
    // naive double DFT on the mean-centered values
    def naivePower(xs: Seq[Double], p: Int): Double = {
      val mu = xs.sum / xs.size
      val c = xs.zipWithIndex.map { case (x, t) => (x - mu) * math.cos(2 * math.Pi * (t % p) / p) }.sum
      val s = xs.zipWithIndex.map { case (x, t) => (x - mu) * math.sin(2 * math.Pi * (t % p) / p) }.sum
      (c * c + s * s) / xs.size
    }
    (2 to 16).foreach { p =>
      val e = naivePower(vs, p)
      assert(math.abs(out(p) - e) <= 0.01 + 1e-6 * math.abs(e), s"period $p: ${out(p)} vs $e")
    }
    // the planted period towers over every other candidate
    val rest = out.collect { case (p, v) if p != planted => v }.max
    assert(out(planted) > 20 * math.max(rest, 1.0), s"planted ${out(planted)} vs rest $rest")
    // flat series: zero centered signal → exactly 0.0 power everywhere
    val flat = (0 until 24).map(i => ("f", (i + 1) * 1000L, 3.0))
    TsAlgebra.periodogram(flat.toDF("k", "ts", "v"), "k", "ts", "v", periods = Seq(4, 6))
      .collect().foreach(r => assert(r.getAs[Double]("spec_power") == 0.0))
  }

  test("rollupCascade equals direct per-resolution aggregation bit-exactly; rejects non-dividing grids") {
    import org.apache.spark.sql.functions._
    // two series, values on the 2-decimal grid, spanning several weeks
    val rows = (0 until 500).flatMap { i =>
      Seq(("a", i * 3600123L, (i % 37) + 0.25), ("b", i * 7200007L, -((i % 11) * 1.5)))
    }
    val df = rows.toDF("k", "ts", "v")
    val buckets = Seq(3600000L, 86400000L, 604800000L)
    val cascade = TsAlgebra.rollupCascade(df, "k", "ts", "v", buckets)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    // direct: every resolution aggregated straight from raw
    val direct = buckets.flatMap { b =>
      df.groupBy(col("k"), (col("ts") - col("ts") % b).as("bucket_ms"))
        .agg(
          sum(round(col("v") * 100, 0).cast("long")).as("sum_pts"), count(lit(1)).as("n"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"))
        .collect().map(r => (r.getString(0), b, r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
    }.toMap
    assert(cascade.keySet == direct.keySet)
    cascade.foreach { case (key, (sp, n, mn, mx, avg)) =>
      val (dsp, dn, dmn, dmx) = direct(key)
      assert((sp, n, mn, mx) == ((dsp, dn, dmn, dmx)), s"cascade != direct at $key")
      // the mean is the exact fixed-decimal division of the shared sums
      val expAvg = (if (dsp < 0) -1L else if (dsp > 0) 1L else 0L) *
        ((math.abs(dsp) * 20000L + 100L * dn) / (200L * dn)) / 10000.0
      assert(avg == expAvg, s"avg mismatch at $key: $avg vs $expAvg")
    }
    intercept[IllegalArgumentException] {
      TsAlgebra.rollupCascade(df, "k", "ts", "v", Seq(3600000L, 5000000L))
    }
  }

  test("dominantPeriod picks the planted cycle (flat ties resolve to the smallest); auto-STL explains it away") {
    def cyc(key: String, p: Int, n: Int) = (0 until n).map(i =>
      (key, (i + 1) * 1000L, math.round((20.0 + 10.0 * math.cos(2 * math.Pi * i / p)) * 100) / 100.0))
    // two period-6 series outvote one period-4 series; a flat series ties
    // every candidate at 0.00 and must resolve to the smallest (2)
    val rows = cyc("a", 6, 48) ++ cyc("b", 6, 48) ++ cyc("c", 4, 48) ++
      (0 until 48).map(i => ("flat", (i + 1) * 1000L, 5.0))
    val df = rows.toDF("k", "ts", "v")
    val dom = TsAlgebra.dominantPeriod(df, "k", "ts", "v", 2 to 12)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Int]("dominant_period")).toMap
    assert(dom == Map("a" -> 6, "b" -> 6, "c" -> 4, "flat" -> 2), s"got $dom")
    assert(TsAlgebra.autoPeriod(df, "k", "ts", "v", 2 to 12) == 6)
    // the auto decomposition at the voted period absorbs the cycle: the
    // periodic series' interior residuals stay well under the 10.0 swing
    val resid = TsAlgebra.stlDecomposeAuto(df, "k", "ts", "v", 2 to 12)
      .collect().filter(r => r.getAs[String]("k") == "a")
      .map(r => math.abs(r.getAs[Long]("resid_fp")))
    assert(resid.sorted.apply(resid.length / 2) < 10000L, "median |resid| must be < 1.0")
  }

  test("seasonalStrength: pure cycle scores seasonal-high, ramp scores trend-high, flat scores 0/0") {
    // 96 points of a clean period-4 square-ish cycle
    val cyc = (0 until 96).map(i => (1L, (i + 1) * 1000L, Seq(10.0, 20.0, 30.0, 20.0)(i % 4), i.toLong))
    // a pure ramp
    val ramp = (0 until 96).map(i => (2L, (i + 1) * 1000L, 5.0 + i * 2.0, i.toLong))
    // flat
    val flat = (0 until 96).map(i => (3L, (i + 1) * 1000L, 7.0, i.toLong))
    val out = TsAlgebra.seasonalStrength(df(cyc ++ ramp ++ flat: _*), "k", "ts", "v", period = 4)
      .collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("season_strength_milli"), r.getAs[Long]("trend_strength_milli")))).toMap
    assert(out(1L)._1 >= 900, s"cycle must be seasonal-dominated: ${out(1L)}")
    assert(out(2L)._2 >= 900, s"ramp must be trend-dominated: ${out(2L)}")
    assert(out(2L)._1 < out(2L)._2, s"ramp is not seasonal: ${out(2L)}")
    assert(out(3L) == ((0L, 0L)), s"flat series: zero-variance denominators report 0: ${out(3L)}")
  }

  test("changepoint: planted level shift found exactly; flat series picks earliest valid split; short series exit") {
    // 10@10.0 then 10@50.0 — the best split is after point 10 (ts 10000)
    val shift = (1 to 10).map(i => (1L, i * 1000L, 10.0, i.toLong)) ++
      (11 to 20).map(i => (1L, i * 1000L, 50.0, i.toLong))
    val got = TsAlgebra.changepoint(df(shift: _*), "k", "ts", "v").collect().head
    assert(got.getAs[Long]("split_ts_ms") == 10000L, got.mkString(","))
    assert(got.getAs[Long]("n_left") == 10L && got.getAs[Long]("n_right") == 10L)
    assert(got.getAs[Double]("left_mean") == 10.0 && got.getAs[Double]("right_mean") == 50.0)
    // gain = X^2*1e6 DIV (n1*n2); X = 10*10000 - 10*50000 = -400000 (centi)
    assert(got.getAs[Long]("gain_micro") == (BigInt(400000).pow(2) * 1000000 / 100).toLong)
    // flat series: every split gains 0 -> earliest valid split (rn = 2)
    val flat = (1 to 8).map(i => (2L, i * 1000L, 7.0, i.toLong))
    val f = TsAlgebra.changepoint(df(flat: _*), "k", "ts", "v").collect().head
    assert(f.getAs[Long]("split_ts_ms") == 2000L && f.getAs[Long]("gain_micro") == 0L)
    // 3-point series has no split with 2 points per side
    val short3 = Seq((3L, 1000L, 1.0, 1L), (3L, 2000L, 2.0, 2L), (3L, 3000L, 99.0, 3L))
    assert(TsAlgebra.changepoint(df(short3: _*), "k", "ts", "v").count() == 0)
    // driver replica on a seeded random walk: exact argmax agreement
    val rnd = new scala.util.Random(11)
    var lvl = 100.0
    val walk = (1 to 60).map { i =>
      lvl += (rnd.nextInt(21) - 10) / 10.0 + (if (i == 37) 25.0 else 0.0)
      (4L, i * 500L, math.rint(lvl * 100) / 100, i.toLong)
    }
    val w = TsAlgebra.changepoint(df(walk: _*), "k", "ts", "v").collect().head
    val vcs = walk.map(r => BigInt(math.round(r._3 * 100)))
    val n = vcs.size
    val s = vcs.sum
    val best = (2 to n - 2).map { t =>
      val s1 = vcs.take(t).sum
      val x = BigInt(n - t) * s1 - BigInt(t) * (s - s1)
      val gm = x * x * 1000000 / (BigInt(t) * BigInt(n - t))
      (gm, -t * 500L, t)
    }.max
    assert(w.getAs[Long]("split_ts_ms") == best._3 * 500L, s"engine ${w.mkString(",")} vs replica $best")
  }

  test("compressEstimate: hand-computed bits for steady cadence, bucket edges, and the derived ratios") {
    // steady cadence + constant value: ts = 64 + 36 + (p-2)*1, val = 64 + (p-1)*1
    val steady = (1 to 10).map(i => (1L, i * 1000L, 5.0, i.toLong))
    val got = TsAlgebra.compressEstimate(df(steady: _*), "k", "ts", "v").collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("n_points"), r.getAs[Long]("ts_bits"), r.getAs[Long]("val_bits"),
          r.getAs[Long]("bytes_est"), r.getAs[Long]("bytes_raw"), r.getAs[Long]("ratio_milli")))).toMap
    // ts: 64 + 36 + 8*1 = 108; val: 64 + 9*1 = 73; bytes = (181+7) DIV 8 = 23
    assert(got(1L) == ((10L, 108L, 73L, 23L, 160L, 143L)), s"got ${got(1L)}")
    // bucket edges, exact both sides: dod = 64 -> 9 bits, 65 -> 12; value
    // dv = 512 -> 13, 513 -> 17. Series 2: dt 1000, 1064 (dod 64), then
    // 1064+65 (dod 65). Values: dv 5.12 -> 512 (13), then +5.13 -> 513 (17).
    val edges = Seq(
      (2L, 0L, 1.0, 1L), (2L, 1000L, 1.0, 2L),
      (2L, 2064L, 6.12, 3L), (2L, 3193L, 11.25, 4L))
    val e = TsAlgebra.compressEstimate(df(edges: _*), "k", "ts", "v").collect().head
    // ts: 64 + 36 + 9 + 12 = 121; val: 64 + 1 (dv 0) + 13 + 17 = 95
    assert(e.getAs[Long]("ts_bits") == 121L && e.getAs[Long]("val_bits") == 95L,
      s"edges: ${e.mkString(",")}")
    // negative edges: dod/dv of -63 stays narrow, -64 widens one bucket
    val neg = Seq(
      (3L, 0L, 10.0, 1L), (3L, 2000L, 9.37, 2L),
      (3L, 3937L, 8.73, 3L), (3L, 5810L, 8.09, 4L))
    // dt: 2000, 1937, 1873 -> dod: -63 (9 bits), -64 (12 bits)
    // vc: 1000, 937, 873, 809 -> dv: -63 (9), -64 (13), -64 (13)
    val n3 = TsAlgebra.compressEstimate(df(neg: _*), "k", "ts", "v").collect().head
    assert(n3.getAs[Long]("ts_bits") == (64L + 36L + 9L + 12L), s"neg ts: ${n3.mkString(",")}")
    assert(n3.getAs[Long]("val_bits") == (64L + 9L + 13L + 13L), s"neg val: ${n3.mkString(",")}")
  }
}
