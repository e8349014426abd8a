package graft.detect

import graft.config.Constants

/** Typed rows for the generalized-ESD fold (Detectors.esdCore, r16):
  * `value` is carried opaquely through the kernel, so the two shapes the
  * detector family feeds (double values for esdOutliers, fixed-point
  * longs for esdOutliersFp) each get a concrete row type.
  * `private[detect]` not `private`: encoder codegen (Janino) needs
  * bytecode-public classes to new them in generated projections.
  */
private[detect] final case class EsdPtD(seriesKey: String, tsMs: Long, value: Double, vc: Long)
private[detect] final case class EsdResD(
    seriesKey: String, tsMs: Long, value: Double, iter: Int, r2_micro: Long)
private[detect] final case class EsdPtL(seriesKey: String, tsMs: Long, value: Long, vc: Long)
private[detect] final case class EsdResL(
    seriesKey: String, tsMs: Long, value: Long, iter: Int, r2_micro: Long)

/** Single-pass bounded-state kernel for generalized ESD (Rosner 1983)
  * over ONE series — the fold form of the k-round window chain.
  *
  * Why bounded state is enough: round i's candidate is the argmax of
  * |n_i·vc − S_i| over the active set, and |vc − mean| is maximized at
  * the active MIN or MAX value, so every candidate across k rounds lies
  * within the k largest or k smallest points ordered by (vc, ts). The
  * kernel accumulates (n, Σvc, Σvc²) plus those two k-bounded lists
  * during the streaming pass and replays the k rounds at series end.
  *
  * Election parity with the window form's max_by((dev, −ts)): within a
  * side, equal-vc ties order by ts asc (the list order); across sides,
  * larger dev wins, dev ties break to the smaller ts. A full (dev, ts)
  * tie across sides (same ts, two values equidistant from the mean) is
  * engine-undefined in the window form too (max_by on equal keys); the
  * kernel picks the max side deterministically.
  *
  * Arithmetic parity: LONG accumulators with Math.*Exact (the kernel
  * twin of ANSI's loud overflow); estimator algebra (dev², n·Q − S²,
  * the ·10⁶ ratio) in BigInteger — the DECIMAL(38,0) widening, k ops
  * per SERIES. The unique-(ts, vc) guard raises at series end with the
  * window form's exact message, and only for series that would be
  * scored (n ≥ MinPoints). Output rows are emitted ts-ascending — the
  * KeyedFoldExec outputOrdering contract.
  */
private[detect] final class EsdKernel[I, O](
    k: Int,
    cut: Int,
    keyOf: I => String,
    tsOf: I => Long,
    vcOf: I => Long,
    mk: (I, Int, Long) => O)
  extends StreamKernel[I, O] {

  private var n = 0L
  private var s = 0L
  private var q = 0L
  // bounded candidate lists: maxC sorted by (vc desc, ts asc), minC by
  // (vc asc, ts asc); both hold at most k entries
  private val maxC = new scala.collection.mutable.ArrayBuffer[I](k + 1)
  private val minC = new scala.collection.mutable.ArrayBuffer[I](k + 1)
  // duplicate-(ts, vc) detection: rows arrive ts-sorted, so duplicates
  // share a contiguous ts run — track the current run's vc set
  private var curTs = 0L
  private var hasCur = false
  private val curVcs = new java.util.HashSet[java.lang.Long]()
  private var hasDup = false
  private var dupRow: I = _

  private def better(a: I, b: I, maxSide: Boolean): Boolean = {
    val av = vcOf(a); val bv = vcOf(b)
    if (av != bv) { if (maxSide) av > bv else av < bv } else tsOf(a) < tsOf(b)
  }

  private def insert(buf: scala.collection.mutable.ArrayBuffer[I], p: I, maxSide: Boolean): Unit = {
    if (buf.length == k && !better(p, buf(k - 1), maxSide)) return
    var idx = buf.length
    while (idx > 0 && better(p, buf(idx - 1), maxSide)) idx -= 1
    buf.insert(idx, p)
    if (buf.length > k) buf.remove(k)
  }

  override def feed(p: I): Iterator[O] = {
    val t = tsOf(p); val v = vcOf(p)
    if (hasCur && t == curTs) {
      if (!curVcs.add(v) && !hasDup) { hasDup = true; dupRow = p }
    } else { curTs = t; hasCur = true; curVcs.clear(); curVcs.add(v) }
    n += 1
    s = Math.addExact(s, v)
    q = Math.addExact(q, Math.multiplyExact(v, v))
    insert(maxC, p, maxSide = true)
    insert(minC, p, maxSide = false)
    Iterator.empty
  }

  override def flush(): Iterator[O] = {
    if (n < Constants.MinPoints) return Iterator.empty
    if (hasDup) throw new IllegalStateException(
      s"esdCore: duplicate (tsMs, value) rows in series ${keyOf(dupRow)} at ts " +
        s"${tsOf(dupRow)} violate the unique-ts contract - de-duplicate at entry " +
        "(TsAlgebra.latest)")
    import java.math.BigInteger
    val cutSq = BigInteger.valueOf(cut.toLong * cut)
    val million = BigInteger.valueOf(1000000L)
    var sC = s
    var qC = q
    val removed = new scala.collection.mutable.ArrayBuffer[I](k)
    def isRemoved(p: I): Boolean = {
      var i = 0
      while (i < removed.length) {
        if (tsOf(removed(i)) == tsOf(p) && vcOf(removed(i)) == vcOf(p)) return true
        i += 1
      }
      false
    }
    val cands = new scala.collection.mutable.ArrayBuffer[(I, Int, Long)](k)
    var maxI = 0
    var i = 1
    while (i <= k) {
      val nI = n - (i - 1)
      if (nI >= Constants.MinPoints) {
        var a = 0
        while (a < maxC.length && isRemoved(maxC(a))) a += 1
        var b = 0
        while (b < minC.length && isRemoved(minC(b))) b += 1
        val pM = maxC(a)
        val pm = minC(b)
        def dev(p: I): Long = {
          val d = Math.subtractExact(Math.multiplyExact(nI, vcOf(p)), sC)
          if (d < 0) Math.negateExact(d) else d
        }
        val dM = dev(pM)
        val dm = dev(pm)
        val cand =
          if (dM != dm) { if (dM > dm) pM else pm }
          else if (tsOf(pM) != tsOf(pm)) { if (tsOf(pM) < tsOf(pm)) pM else pm }
          else pM // same point, or the engine-undefined full tie
        val dC = if (dM > dm) dM else dm
        val num = BigInteger.valueOf(dC).multiply(BigInteger.valueOf(dC))
        val den = BigInteger.valueOf(nI).multiply(BigInteger.valueOf(qC))
          .subtract(BigInteger.valueOf(sC).multiply(BigInteger.valueOf(sC)))
        if (den.signum > 0 && num.compareTo(cutSq.multiply(den)) > 0) maxI = i
        // non-negative operands: floor division == the DIV truncation;
        // longValueExact fails loudly if the ratio outgrows BIGINT (the
        // ANSI behavior of the window form's DIV)
        val r2 =
          if (den.signum > 0) num.multiply(million).divide(den).longValueExact() else 0L
        cands += ((cand, i, r2))
        val vcC = vcOf(cand)
        sC = Math.subtractExact(sC, vcC)
        qC = Math.subtractExact(qC, Math.multiplyExact(vcC, vcC))
        removed += cand
      }
      i += 1
    }
    val mi = maxI
    cands.iterator
      .filter(_._2 <= mi)
      .toArray
      .sortBy(c => tsOf(c._1)) // KeyedFoldExec declares (key, ts) output order
      .iterator
      .map { case (p, it, r2) => mk(p, it, r2) }
  }
}
