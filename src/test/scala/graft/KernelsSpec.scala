package graft

import graft.detect._
import graft.model.TsSample
import org.scalatest.funsuite.AnyFunSuite

/** Pure kernel tests — no SparkSession needed. Fixture values follow
  * FIXTURES.md §1 (the reference test suite's ramp+spike series).
  */
class KernelsSpec extends AnyFunSuite {

  private def p(k: Long, ts: Long, v: Double) = TsSample(k.toString, ts, v)

  test("ExpAvgKernel computes the luminol-shape EMA recurrence") {
    val in = Seq(p(1, 1000, 10), p(1, 2000, 20), p(1, 3000, 30), p(1, 4000, 100))
    val out = KeyedFold.run[TsSample, RawScored, String](in.iterator, _.seriesKey, () => new ExpAvgKernel(0.2)).toSeq
    val emas = Seq(10.0, 12.0, 15.6, 32.48)
    assert(out.map(_.tsMs) == Seq(1000L, 2000L, 3000L, 4000L))
    out.zip(in.map(_.value).zip(emas)).foreach { case (s, (v, e)) =>
      assert(math.abs(s.dev - (v - e)) < 1e-12)
    }
  }

  test("DerivativeKernel: d0 := d1, ema over derivatives, |d - ema|") {
    val in = Seq(p(1, 1000, 10), p(1, 2000, 20), p(1, 3000, 30), p(1, 4000, 100))
    val out = KeyedFold.run[TsSample, RawScored, String](in.iterator, _.seriesKey, () => new DerivativeKernel(0.2)).toSeq
    // derivatives (per second): [10, 10, 10, 70]; ema: [10, 10, 10, 22]
    val expect = Seq(0.0, 0.0, 0.0, 48.0)
    assert(out.map(_.tsMs) == Seq(1000L, 2000L, 3000L, 4000L))
    out.zip(expect).foreach { case (s, e) => assert(math.abs(s.dev - e) < 1e-12) }
  }

  test("HoltWintersKernel matches a naive replay and absorbs a pure seasonal cycle") {
    // independent naive replay (array-of-state loop, distinct from the kernel's code path)
    def naive(vs: Seq[Double], a: Double, b0: Double, g: Double, m: Int): Seq[Double] = {
      var l = 0.0; var b = 0.0; val s = Array.fill(m)(0.0)
      vs.zipWithIndex.map { case (v, i) =>
        val j = i % m
        if (i == 0) { l = v; b = 0.0; 0.0 }
        else {
          val dev = v - (l + b + s(j))
          val l1 = a * (v - s(j)) + (1 - a) * (l + b)
          val b1 = b0 * (l1 - l) + (1 - b0) * b
          s(j) = g * (v - l1) + (1 - g) * s(j)
          l = l1; b = b1
          dev
        }
      }
    }
    val pattern = Array(0.0, 8.0, 0.0, -8.0)
    val vs = (0 until 48).map(i => 20.0 + pattern(i % 4))
    val in = vs.zipWithIndex.map { case (v, i) => p(1, (i + 1) * 1000L, v) }
    val out = KeyedFold
      .run[TsSample, RawScored, String](in.iterator, _.seriesKey, () => new HoltWintersKernel(0.2, 0.1, 0.3, 4))
      .toSeq
    val expect = naive(vs, 0.2, 0.1, 0.3, 4)
    out.zip(expect).foreach { case (s, e) => assert(s.dev == e, s"ts ${s.tsMs}") }
    // the seasonal profile is learned: last-cycle deviations are a small
    // fraction of the first post-seed cycle's (Holt would keep flagging
    // every swing of the period-4 pattern forever)
    val early = out.slice(1, 5).map(s => math.abs(s.dev)).max
    val late = out.takeRight(4).map(s => math.abs(s.dev)).max
    assert(late < 0.15 * early, s"late $late vs early $early")
  }

  test("KeyedFold resets state between keys and preserves order") {
    val in = Seq(p(1, 1000, 10), p(1, 2000, 20), p(2, 1000, 5), p(2, 2000, 5))
    val out = KeyedFold.run[TsSample, RawScored, String](in.iterator, _.seriesKey, () => new ExpAvgKernel(0.2)).toSeq
    assert(out.map(s => (s.seriesKey, s.tsMs)) == Seq(("1", 1000L), ("1", 2000L), ("2", 1000L), ("2", 2000L)))
    // first point of each key has dev 0 (ema seeded with v0)
    assert(out(0).dev == 0.0 && out(2).dev == 0.0)
  }

  test("DerivativeKernel single-point series emits dev 0 at flush") {
    val in = Seq(p(1, 1000, 10))
    val out = KeyedFold.run[TsSample, RawScored, String](in.iterator, _.seriesKey, () => new DerivativeKernel(0.2)).toSeq
    assert(out == Seq(RawScored("1", 1000, 10, 0.0)))
  }

  test("BitmapKernel: constant series scores 0 everywhere, emits all points in order") {
    val n = 60
    val in = (0 until n).map(i => BitmapPoint("1", 1000L * i, 5.0, n, 5.0, 5.0))
    val out = KeyedFold
      .run[BitmapPoint, RawScored, String](in.iterator, _.seriesKey, () => new BitmapKernel(4, 2, 0.2, 5, 20))
      .toSeq
    assert(out.size == n)
    assert(out.map(_.tsMs) == in.map(_.tsMs))
    assert(out.forall(_.dev == 0.0))
  }

  test("BitmapKernel: level shift scores positive near the change point") {
    val n = 60
    val vals = (0 until n).map(i => if (i < 30) 1.0 else 9.0)
    val in = (0 until n).map(i => BitmapPoint("1", 1000L * i, vals(i), n, 1.0, 9.0))
    val out = KeyedFold
      .run[BitmapPoint, RawScored, String](in.iterator, _.seriesKey, () => new BitmapKernel(4, 2, 0.2, 5, 20))
      .toSeq
    assert(out.size == n)
    val nearShift = out.filter(s => s.tsMs >= 25000 && s.tsMs <= 35000)
    assert(nearShift.exists(_.dev > 0.0))
    // far from the shift both windows see identical distributions
    assert(out.take(10).forall(_.dev == 0.0))
  }
}
