package graft

import graft.config.{DetectorConfig, TsQueryConfig}
import graft.detect._
import graft.detect.{CountedPoint, ExpAvgLagKernel}
import graft.model.TsSample
import graft.ts.{TsAlgebra, TsCols}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.2.3). Kernel properties run
  * pure (no Spark); Spark-level properties use one session on sampled
  * inputs.
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("properties-spec")
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(30)
  private def check(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  private val seriesGen: Gen[List[TsSample]] = for {
    n <- Gen.chooseNum(1, 60)
    vals <- Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))
  } yield vals.zipWithIndex.map { case (v, i) => TsSample("1", 1000L * (i + 1), math.rint(v * 100) / 100) }

  test("property: kernels emit exactly one score per point, in timestamp order") {
    check(Prop.forAll(seriesGen) { s =>
      val dv = KeyedFold.run[TsSample, RawScored, String](s.iterator, _.seriesKey, () => new DerivativeKernel(0.2)).toList
      val ea = KeyedFold.run[TsSample, RawScored, String](s.iterator, _.seriesKey, () => new ExpAvgKernel(0.2)).toList
      dv.size == s.size && ea.size == s.size &&
      dv.map(_.tsMs) == s.map(_.tsMs) && ea.map(_.tsMs) == s.map(_.tsMs)
    })
  }

  test("property: bitmap kernel matches a naive O(n·w) reference implementation") {
    val gen = for {
      n <- Gen.chooseNum(5, 80)
      vals <- Gen.listOfN(n, Gen.chooseNum(0.0, 10.0))
    } yield vals
    check(Prop.forAll(gen) { vals =>
      val n = vals.size
      val (precision, chunk, minW, maxW, pct) = (4, 2, 3, 10, 0.2)
      val w = math.max(minW, math.min(maxW, math.round(pct * n).toInt))
      val vmin = vals.min
      val vmax = vals.max
      def sym(v: Double) =
        if (vmax == vmin) 0 else math.min(precision - 1, ((v - vmin) / (vmax - vmin) * precision).toInt)
      val syms = vals.map(sym)
      def freqs(from: Int, to: Int): Map[Seq[Int], Int] =
        (from until to - chunk + 1).filter(_ >= from).map(i => syms.slice(i, i + chunk))
          .groupBy(identity).map { case (k, v) => k -> v.size }
      def naive(j: Int): Double =
        if (j < w || j + w - 1 > n - 1) 0.0
        else {
          val a = freqs(j - w, j); val b = freqs(j, j + w)
          (a.keySet ++ b.keySet).toSeq.map { k =>
            val d = (a.getOrElse(k, 0) - b.getOrElse(k, 0)).toDouble; d * d
          }.sum
        }
      val in = vals.zipWithIndex.map { case (v, i) => BitmapPoint("1", 1000L * i, v, n, vmin, vmax) }
      val got = KeyedFold
        .run[BitmapPoint, RawScored, String](in.iterator, _.seriesKey, () => new BitmapKernel(precision, chunk, pct, minW, maxW))
        .toList
      got.size == n && got.zipWithIndex.forall { case (s, j) => math.abs(s.dev - naive(j)) < 1e-9 }
    })
  }

  private val cols = TsCols(key = "k", ts = "ts", value = "v", seq = None)

  test("property: REVRANGE equals reverse(RANGE); bucketed sums repartition losslessly") {
    // sampled (not per-generated-case) to keep Spark job count sane
    val series = seriesGen.sample.get ++ seriesGen.sample.get.map(p => p.copy(seriesKey = "2"))
    val df = series.map(p => (p.seriesKey, p.tsMs, p.value)).toDF("k", "ts", "v")
    val fwd = TsAlgebra.query(df, TsQueryConfig(), cols).collect().map(r => (r.getString(0), r.getLong(1)))
    val rev = TsAlgebra.query(df, TsQueryConfig(reversed = true), cols).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(fwd.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap ==
      rev.groupBy(_._1).view.mapValues(_.map(_._2).reverse.toSeq).toMap)

    val bucketed = TsAlgebra
      .query(df, TsQueryConfig(aggregationType = Some("sum"), bucketSizeMs = Some(7000)), cols)
      .collect().map(_.getDouble(2)).sum
    val total = series.map(_.value).sum
    assert(math.abs(bucketed - total) < 1e-6)

    val cnt = TsAlgebra
      .query(df, TsQueryConfig(aggregationType = Some("count"), bucketSizeMs = Some(7000)), cols)
      .collect().map(_.getLong(2)).sum
    assert(cnt == series.size)
  }

  test("property: anomaly windows are disjoint, ordered, within the series range, above threshold") {
    val rnd = new scala.util.Random(42)
    val series = (1 to 3).flatMap { k =>
      (1 to 50).map(i => TsSample(k.toString, 1000L * i, math.rint(rnd.nextGaussian() * 1000) / 100 +
        (if (i % 17 == 0) 50.0 else 0.0)))
    }
    val pts = series.toDS()
    val scores = Detectors.derivativeScores(pts)
    val thr = Detectors.withThreshold(scores, DetectorConfig())
    val wins = Detectors.anomalies(thr).collect()
    val byKey = wins.groupBy(_.getAs[String]("seriesKey"))
    byKey.foreach { case (k, ws) =>
      val sorted = ws.sortBy(_.getAs[Long]("startTsMs"))
      sorted.foreach { w =>
        assert(w.getAs[Long]("startTsMs") <= w.getAs[Long]("endTsMs"))
        assert(w.getAs[Long]("startTsMs") >= 1000L && w.getAs[Long]("endTsMs") <= 50000L)
        val e = w.getAs[Long]("exactTsMs")
        assert(e >= w.getAs[Long]("startTsMs") && e <= w.getAs[Long]("endTsMs"))
      }
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getAs[Long]("endTsMs") < b.getAs[Long]("startTsMs"))
        case _ =>
      }
      // every window's peak is strictly above the per-key threshold
      val thrK = thr.where(s"seriesKey = '$k'").select("threshold").head().getDouble(0)
      sorted.foreach(w => assert(w.getAs[Double]("anomalyScore") > thrK))
    }
    assert(wins.nonEmpty)
  }

  test("property: chunked EMA fold matches the sequential kernel on one giant multi-chunk series") {
    // ONE key spanning many chunks: KeyedFold would fold it on a single
    // task; ChunkedEma folds chunks in parallel and must agree to fp-ulp.
    val rnd = new scala.util.Random(7)
    val series = (1 to 5000).map(i =>
      TsSample("big", 1000L * i, math.rint(rnd.nextGaussian() * 10000) / 100)) ++
      (1 to 40).map(i => TsSample("small", 1000L * i, i.toDouble)) // a second key must not interfere
    val sequential = KeyedFold
      .run[TsSample, RawScored, String](
        series.sortBy(p => (p.seriesKey, p.tsMs)).iterator, _.seriesKey, () => new ExpAvgKernel(0.2))
      .map(s => (s.seriesKey, s.tsMs) -> s.dev).toMap
    // chunk widths from near-single-point chunks to wider-than-the-series
    // (the latter degenerates to the plain sequential fold)
    Seq(3000L, 250000L, 10000000L).foreach { chunkMs =>
      val got = ChunkedEma.scores(series.toDS().repartition(8), 0.2, chunkMs).collect()
      assert(got.length == sequential.size, s"chunkMs=$chunkMs")
      got.foreach { s =>
        val want = sequential((s.seriesKey, s.tsMs))
        assert(math.abs(s.dev - want) <= 1e-9 * math.max(1.0, math.abs(want)),
          s"chunkMs=$chunkMs key=${s.seriesKey} ts=${s.tsMs}: chunked=${s.dev} sequential=$want")
      }
    }
  }

  test("property: lag-window exp_avg kernel matches a naive reference") {
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      vals <- Gen.listOfN(n, Gen.chooseNum(-50.0, 50.0))
    } yield vals
    check(Prop.forAll(gen) { vals =>
      val n = vals.size
      val (alpha, pct, maxLag) = (0.2, 0.2, 8)
      val lag = math.min(maxLag, (n * pct).toInt)
      val mean = vals.sum / n
      val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / n)
      def emaLast(slice: Seq[Double]): Double =
        slice.tail.foldLeft(slice.head)((e, v) => alpha * v + (1 - alpha) * e)
      def naive(i: Int): Double = {
        val slice = vals.slice(math.max(0, i - lag), i + 1)
        val dev = math.abs(vals(i) - emaLast(slice))
        if (sd > 0) dev / sd else dev
      }
      val in = vals.zipWithIndex.map { case (v, i) => CountedPoint("1", 1000L * i, v, n, sd) }
      val got = KeyedFold
        .run[CountedPoint, RawScored, String](in.iterator, _.seriesKey, () => new ExpAvgLagKernel(alpha, pct, maxLag))
        .toList
      got.size == n && got.zipWithIndex.forall { case (s, i) => math.abs(s.dev - naive(i)) < 1e-9 }
    })
  }

  test("property: CDC boundaries — rolling hash equals the windowed-sum definition; chunks tile") {
    import graft.ext.Dedup
    val textGen = for {
      n <- Gen.chooseNum(0, 300)
      cs <- Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.const(' ')))
    } yield cs.mkString
    def windowedHash(t: String, i: Int): Long = {
      val pw = Dedup.cdcPowers
      (0 until Dedup.CdcWindow)
        .map(k => t.charAt(i - 1 - k).toLong * pw(k) % Dedup.CdcMod)
        .sum % Dedup.CdcMod
    }
    check(Prop.forAll(textGen) { t =>
      val b = Dedup.cdcBoundaries(t)
      val increasing = b.sliding(2).forall(p => p.size < 2 || p(0) < p(1))
      val tiles = if (t.isEmpty) b.isEmpty else b.nonEmpty && b.last == t.length
      // every position >= w is a boundary IFF the direct windowed sum
      // satisfies the mask (except the forced doc end)
      val interiorOk = (Dedup.CdcWindow to t.length).forall { i =>
        val isBoundary = b.contains(i)
        val maskHit = windowedHash(t, i) % Dedup.CdcMask == 0L
        if (i == t.length) isBoundary else isBoundary == maskHit
      }
      increasing && tiles && interiorOk
    })
  }

  test("property: next-fit packing — capacity invariant, dense sequences, running offsets") {
    import graft.ext.{PackedDoc, Packing}
    val sizesGen = for {
      n <- Gen.chooseNum(1, 80)
      sizes <- Gen.listOfN(n, Gen.chooseNum(1L, 150L))
    } yield sizes
    val cap = 100L
    check(Prop.forAll(sizesGen) { sizes =>
      val in = sizes.zipWithIndex.map { case (sz, i) => ("g", i.toLong, sz) }
      val out = KeyedFold
        .run[(String, Long, Long), PackedDoc, String](in.iterator, _._1, () => new Packing.PackKernel(cap))
        .toList
      val bySeq = out.groupBy(_.seq_idx)
      val capOk = bySeq.values.forall(ch => ch.size == 1 || ch.map(_.n_tokens).sum <= cap)
      val dense = bySeq.keySet == (0L until bySeq.size.toLong).toSet
      val offsetsOk = bySeq.values.forall { ch =>
        ch.sortBy(_.seq_pos).foldLeft((0L, true)) { case ((acc, ok), d) =>
          (acc + d.n_tokens, ok && d.seq_off == acc)
        }._2
      }
      val oversizeOk = out.forall(d => d.oversize == (d.n_tokens > cap))
      out.size == sizes.size && capOk && dense && offsetsOk && oversizeOk
    })
  }

  test("property: doubled-space replace merge == direct greedy left-to-right pair merge") {
    // the invariant bpeTrainVocab rests on: one non-overlapping replace
    // over the ` a  b ` form implements exactly the greedy scan (each
    // match keeps one boundary space for the next candidate)
    val tokGen = for {
      n <- Gen.chooseNum(1, 12)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "ba", "c"))
      l <- Gen.oneOf("a", "b", "ab", "c")
      r <- Gen.oneOf("a", "b", "ab", "c")
    } yield (toks, l, r)
    def direct(toks: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) { out += (l + r); i += 2 }
        else { out += toks(i); i += 1 }
      }
      out.toList
    }
    check(Prop.forAll(tokGen) { case (toks, l, r) =>
      val s = " " + toks.mkString("  ") + " "
      val merged = s.replace(s" $l  $r ", s" $l$r ")
      val viaReplace = merged.trim.split("  ").toList
      viaReplace == direct(toks, l, r)
    })
  }

  test("property: bottom-k of a union == bottom-k of the union of bottom-ks (KMV merge algebra)") {
    val gen = for {
      a <- Gen.listOf(Gen.chooseNum(0L, 500L))
      b <- Gen.listOf(Gen.chooseNum(0L, 500L))
      k <- Gen.chooseNum(2, 20)
    } yield (a.toSet, b.toSet, k)
    def bottomK(s: Set[Long], k: Int) = s.toList.sorted.take(k).toSet
    check(Prop.forAll(gen) { case (a, b, k) =>
      bottomK(a ++ b, k) == bottomK(bottomK(a, k) ++ bottomK(b, k), k)
    })
  }
}
