package graft.detect

import graft.model.TsSample
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions.col

import scala.reflect.runtime.universe.TypeTag

/** One point scored by a kernel; `dev` is the raw (pre-normalization)
  * deviation — detector-specific normalization happens relationally
  * afterwards (Detectors.scala).
  */
final case class RawScored(seriesKey: String, tsMs: Long, value: Double, dev: Double)

/** A per-series streaming kernel. `feed` receives rows in ascending
  * timestamp order and may buffer a bounded lookahead; `flush` drains it at
  * series end. State must be bounded (never proportional to series length).
  */
trait StreamKernel[I, O] {
  def feed(i: I): Iterator[O]
  def flush(): Iterator[O]
}

/** Kernel over bare samples (EMA-style recurrences). */
trait SeriesKernel extends StreamKernel[TsSample, RawScored]

/** Secondary-sort fold for sequential recurrences (EMA and friends,
  * SURVEY.md §4.2, §7.5).
  *
  * The reference computes these as single-threaded NumPy loops over one
  * in-memory series (/root/reference/potoos/client.py:87-95). At 100 TB
  * that is impossible; here we repartition by series key and sort within
  * partitions by (key, ts) — the classic secondary-sort pattern — then
  * stream each partition once. Parallelism is across series keys; memory
  * is bounded per series (never collect_list / never buffer a series), so
  * a series longer than executor memory still works: Spark's external
  * sort spills, the fold streams. The residual bound — ONE series folds on
  * one task — is removable for linear recurrences via the chunked
  * parallel-scan schedule in ChunkedEma (ChunkedFold.scala).
  */
object KeyedFold {

  def fold(points: Dataset[TsSample])(mkKernel: () => SeriesKernel): Dataset[RawScored] = {
    import points.sparkSession.implicits._
    foldOn[TsSample, RawScored, String](points, "seriesKey", "tsMs", _.seriesKey)(mkKernel)
  }

  /** Generic secondary-sort fold over any keyed, time-ordered input.
    * The key type K is opaque — only equality of consecutive keys is used.
    */
  def foldOn[I, O: Encoder, K](
      ds: Dataset[I],
      keyCol: String,
      tsCol: String,
      keyOf: I => K)(mkKernel: () => StreamKernel[I, O]): Dataset[O] =
    ds.repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol))
      .mapPartitions { it => run(it, keyOf, mkKernel) }

  /** Fold assuming the input is ALREADY co-partitioned by the key column —
    * e.g. read from a table `bucketBy(n, key)` on disk (with bucketed
    * scans forced via spark.sql.sources.bucketing.autoBucketedScan
    * .enabled=false, so each bucket arrives as one partition). Skips the
    * shuffle entirely and only sorts within partitions: at 100 TB this is
    * the difference between shuffling the whole fact table per run and
    * ZERO data movement when the layout is bucket-by-key. Correctness
    * requires every key to live wholly inside one input partition — the
    * bucketed-layout guarantee; this is not checked at runtime.
    */
  def foldOnPrePartitioned[I, O: Encoder, K](
      ds: Dataset[I],
      keyCol: String,
      tsCol: String,
      keyOf: I => K)(mkKernel: () => StreamKernel[I, O]): Dataset[O] =
    ds.sortWithinPartitions(col(keyCol), col(tsCol))
      .mapPartitions { it => run(it, keyOf, mkKernel) }

  def foldPrePartitioned(points: Dataset[TsSample])(mkKernel: () => SeriesKernel): Dataset[RawScored] = {
    import points.sparkSession.implicits._
    foldOnPrePartitioned[TsSample, RawScored, String](points, "seriesKey", "tsMs", _.seriesKey)(mkKernel)
  }

  /** Catalyst-planned fold: emits a custom KeyedFoldNode and lets
    * EnsureRequirements decide the exchange/sort (elided when the input
    * is already hash-distributed / sorted — bucketed scans, upstream
    * joins/aggregations, reused exchanges; see graft.plans.KeyedFoldPlan).
    * Same kernel semantics as `foldOn`; only input planning differs.
    */
  def foldOnExec[I: TypeTag, O: TypeTag, K](
      ds: Dataset[I],
      keyCol: String,
      tsCol: String,
      keyOf: I => K)(mkKernel: () => StreamKernel[I, O]): Dataset[O] = {
    val spark = ds.sparkSession
    graft.plans.KeyedFoldPlan.ensureStrategy(spark)
    val inEnc = ExpressionEncoder[I]()
    val outEnc = ExpressionEncoder[O]()
    val node = graft.plans.KeyedFoldNode(
      mkKernel.asInstanceOf[() => StreamKernel[Any, Any]],
      keyOf.asInstanceOf[Any => Any],
      inEnc,
      outEnc,
      keyCol,
      tsCol,
      graft.plans.KeyedFoldPlan.outputFor(outEnc),
      graft.bridge.SqlBridge.analyzedPlan(ds.toDF()))
    graft.bridge.SqlBridge.ofRows(spark, node).as[O](outEnc)
  }

  /** Catalyst-planned fold over bare samples (EMA-style recurrences). */
  def foldExec(points: Dataset[TsSample])(mkKernel: () => SeriesKernel): Dataset[RawScored] =
    foldOnExec[TsSample, RawScored, String](points, "seriesKey", "tsMs", _.seriesKey)(mkKernel)

  /** Streams a sorted (key, ts) iterator through fresh kernels, one per
    * key run. Pure function of the iterator — unit-testable without Spark.
    */
  def run[I, O, K](it: Iterator[I], keyOf: I => K, mkKernel: () => StreamKernel[I, O]): Iterator[O] =
    new Iterator[O] {
      private var out: Iterator[O] = Iterator.empty
      private var kernel: StreamKernel[I, O] = _
      private var curKey: K = _

      private def advance(): Unit =
        while (!out.hasNext && (it.hasNext || kernel != null)) {
          if (it.hasNext) {
            val p = it.next()
            val k = keyOf(p)
            if (kernel == null) {
              kernel = mkKernel(); curKey = k
              out = kernel.feed(p)
            } else if (k != curKey) {
              val tail = kernel.flush()
              kernel = mkKernel(); curKey = k
              out = tail ++ kernel.feed(p)
            } else {
              out = kernel.feed(p)
            }
          } else {
            out = kernel.flush(); kernel = null
          }
        }

      override def hasNext: Boolean = { advance(); out.hasNext }
      override def next(): O = { advance(); out.next() }
    }
}
