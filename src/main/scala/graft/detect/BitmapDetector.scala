package graft.detect

import graft.config.Constants
import graft.model.TsSample
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Sample enriched with the per-series stats the SAX quantizer needs. */
final case class BitmapPoint(seriesKey: String, tsMs: Long, value: Double, n: Long, vmin: Double, vmax: Double)

/** D4 bitmap_detector (SURVEY.md §2.4 D4) — SAX-bitmap anomaly scoring,
  * shape per the public luminol 0.4 bitmap detector:
  *
  *  1. quantize each value into `precision` symbols over the series'
  *     [min, max] value range;
  *  2. slide `chunkSize`-grams of symbols;
  *  3. for each point i with a complete lagging window [i−w, i−1] and
  *     future window [i, i+w−1] (w = clamp(pct·n)), score_i = the sum of
  *     squared differences between the two windows' chunk-frequency maps;
  *     incomplete-window edge points score 0.
  *
  * The per-series (n, min, max) pre-pass is a plain aggregate + join
  * (partial-aggregated, broadcast when small); the scoring itself is a
  * KeyedFold kernel with O(w) state (w ≤ BitmapMaxWindow), so memory stays
  * bounded regardless of series length.
  */
object BitmapDetector {

  def scores(
      points: Dataset[TsSample],
      precision: Int = Constants.BitmapPrecision,
      chunkSize: Int = Constants.BitmapChunkSize,
      windowPct: Double = Constants.BitmapWindowPct,
      minWindow: Int = Constants.BitmapMinWindow,
      maxWindow: Int = Constants.BitmapMaxWindow): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val stats = points
      .groupBy("seriesKey")
      .agg(count(lit(1)).as("n"), min("value").as("vmin"), max("value").as("vmax"))
    val enriched = points.toDF()
      .join(stats, Seq("seriesKey"))
      .select(col("seriesKey"), col("tsMs"), col("value"), col("n"), col("vmin"), col("vmax"))
      .as[BitmapPoint]
    KeyedFold
      .foldOnExec[BitmapPoint, RawScored, String](enriched, "seriesKey", "tsMs", _.seriesKey)(() =>
        new BitmapKernel(precision, chunkSize, windowPct, minWindow, maxWindow))
      .toDF()
      .withColumnRenamed("dev", "score")
      .select("seriesKey", "tsMs", "value", "score")
  }
}

/** Ring-buffered SAX kernel: holds ≤ 2w + chunk symbols, emits point i once
  * its future window has fully arrived (or at flush, scored 0).
  */
final class BitmapKernel(precision: Int, chunkSize: Int, windowPct: Double, minWindow: Int, maxWindow: Int)
    extends StreamKernel[BitmapPoint, RawScored] {

  private var w = -1
  private var curKey: String = ""
  // absolute index of the first retained buffer entry
  private var base = 0L
  private var nextEmit = 0L
  private var seen = 0L
  private val buf = mutable.ArrayDeque.empty[(Long, Double, Int)] // (ts, value, symbol)

  private def symbolOf(p: BitmapPoint): Int =
    if (p.vmax == p.vmin) 0
    else math.min(precision - 1, ((p.value - p.vmin) / (p.vmax - p.vmin) * precision).toInt)

  override def feed(p: BitmapPoint): Iterator[RawScored] = {
    if (w < 0) w = math.max(minWindow, math.min(maxWindow, math.round(windowPct * p.n).toInt))
    curKey = p.seriesKey
    buf.append((p.tsMs, p.value, symbolOf(p)))
    seen += 1
    val out = Vector.newBuilder[RawScored]
    // point j is emittable once index j+w-1 has arrived
    while (nextEmit + w <= seen) {
      out += emit(curKey, nextEmit, complete = true)
      nextEmit += 1
      dropFront()
    }
    out.result().iterator
  }

  override def flush(): Iterator[RawScored] = {
    val out = Vector.newBuilder[RawScored]
    while (nextEmit < seen) {
      out += emit(curKey, nextEmit, complete = false)
      nextEmit += 1
      dropFront()
    }
    reset()
    out.result().iterator
  }

  private def emit(key: String, j: Long, complete: Boolean): RawScored = {
    val (ts, v, _) = buf((j - base).toInt)
    val score =
      if (!complete || j < w) 0.0
      else {
        val lagFrom = (j - w - base).toInt
        val lagTo = (j - base).toInt // exclusive
        val futTo = math.min(buf.length, (j + w - base).toInt) // exclusive
        ssd(chunkFreqs(lagFrom, lagTo), chunkFreqs(lagTo, futTo))
      }
    RawScored(key, ts, v, score)
  }

  /** chunk-frequency map of symbol `chunkSize`-grams fully inside [from, to). */
  private def chunkFreqs(from: Int, to: Int): mutable.Map[Int, Int] = {
    val m = mutable.Map.empty[Int, Int].withDefaultValue(0)
    var i = from
    while (i + chunkSize <= to) {
      var code = 0
      var c = 0
      while (c < chunkSize) { code = code * precision + buf(i + c)._3; c += 1 }
      m(code) += 1
      i += 1
    }
    m
  }

  private def ssd(a: mutable.Map[Int, Int], b: mutable.Map[Int, Int]): Double = {
    var s = 0.0
    (a.keySet ++ b.keySet).foreach { k =>
      val d = (a(k) - b(k)).toDouble
      s += d * d
    }
    s
  }

  private def dropFront(): Unit =
    while (base < nextEmit - w - chunkSize + 1) { buf.removeHead(); base += 1 }

  private def reset(): Unit = { w = -1; base = 0L; nextEmit = 0L; seen = 0L; buf.clear() }
}
