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
