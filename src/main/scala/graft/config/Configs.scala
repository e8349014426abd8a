package graft.config

/** Centralized algorithm constants (SURVEY.md §7.5).
  *
  * Shapes of the detection formulas follow the public luminol 0.4 library
  * that the reference delegates to (/root/reference/potoos/client.py:89-95);
  * constants are re-derived from public knowledge of that library and are
  * THE defining semantics of this engine (the reference pins luminol>=0.4
  * at /root/reference/pyproject.toml:31 but contains no formulas itself).
  */
object Constants {
  /** EMA smoothing factor (luminol exp_avg/derivative default). */
  val DefaultSmoothingFactor = 0.2
  /** exp_avg lag-window size as a fraction of series length, and the
    * bounded-state clamp (the clamp is ours — kernel state must stay O(1)
    * at 100 TB; divergence documented in Detectors.expAvgLagScores).
    */
  val DefaultEmaLagWindowPct = 0.2
  val DefaultEmaLagWindowMax = 200
  /** Default anomaly threshold as a fraction of the per-series max score
    * (/root/reference/potoos/models/config.py:84-85 leaves both thresholds
    * unset → percent-of-max default applies).
    */
  val DefaultScorePercentThreshold = 0.2
  /** default_detector combination (SURVEY.md §2.4 D5). */
  val DefaultDetectorEmaSignificant = 0.94
  val DefaultDetectorEmaWeight = 0.65
  /** Minimum series cardinality (/root/reference/potoos/client.py:84-85). */
  val MinPoints = 4
  /** Event-time TTL for streaming per-series state: a series quiet this
    * long is considered dead and its state-store entry is dropped (bounds
    * state at unbounded key cardinality; a returning key re-seeds).
    */
  val DefaultStreamStateTtlMs: Long = 24L * 3600 * 1000
  /** MAD→σ consistency constant for the robust z-score detector
    * (1/Φ⁻¹(3/4), the standard normal-consistency scale for the median
    * absolute deviation).
    */
  val MadConsistency = 1.4826
  /** Two-sided CUSUM slack (allowance) in σ units, the classic
    * k = δ/2 for a target shift of δ = 1σ: noise within half a sigma
    * is absorbed, a sustained level shift integrates linearly.
    */
  val CusumSlack = 0.5
  /** Holt double-exponential TREND smoothing factor β (the level factor
    * α reuses DefaultSmoothingFactor).
    */
  val HoltTrendFactor = 0.1
  /** Holt-Winters SEASONAL smoothing factor γ and default additive
    * period m (slots in the repeating profile; the oracled query uses
    * m = 4 so the recursive-CTE oracle can carry the seasonal state as
    * columns — the kernel itself takes any m ≥ 2 with O(m) state).
    */
  val HwSeasonFactor = 0.3
  val HwPeriod = 4
  /** bitmap_detector defaults (SURVEY.md §2.4 D4). */
  val BitmapPrecision = 4
  val BitmapChunkSize = 2
  val BitmapWindowPct = 0.02
  val BitmapMinWindow = 10
  val BitmapMaxWindow = 200
}

/** Bucket alignment for time-bucketed aggregation —
  * reference `align: 'start'|'end'|int` (/root/reference/potoos/models/config.py:50).
  */
sealed trait Align
object Align {
  case object Epoch extends Align // default: buckets aligned to epoch 0
  case object Start extends Align // align to from_time
  case object End extends Align // align to to_time
  final case class At(ms: Long) extends Align
}

/** Where the reported bucket timestamp sits — reference `bucket_timestamp`
  * '-'|'+'|'~' (/root/reference/potoos/models/config.py:52).
  */
sealed trait BucketTs
object BucketTs {
  case object Start extends BucketTs
  case object End extends BucketTs
  case object Mid extends BucketTs
}

/** Mirror of the reference `TimeSeriesConfig`
  * (/root/reference/potoos/models/config.py:33-55), minus the kwarg-leak
  * defect (SURVEY.md §2.6.2): dispatch flags never reach the source.
  * `None` bounds stand in for the '-'/'+' sentinels (config.py:34-35).
  */
final case class TsQueryConfig(
    fromTimeMs: Option[Long] = None,
    toTimeMs: Option[Long] = None,
    count: Option[Int] = None,
    // multi-series generalization of COUNT: first N samples in scan order
    // PER SERIES (the reference is single-series, so its COUNT and this
    // coincide there)
    countPerKey: Option[Int] = None,
    aggregationType: Option[String] = None,
    bucketSizeMs: Option[Long] = None,
    filterByTs: Option[Seq[Long]] = None,
    filterByMinValue: Option[Double] = None,
    filterByMaxValue: Option[Double] = None,
    align: Align = Align.Epoch,
    latest: Boolean = false,
    bucketTimestamp: BucketTs = BucketTs.Start,
    reversed: Boolean = false,
    // Declares the value column as fixed-decimal (e.g. Some(2) for cent
    // values). Bucketed `avg` then runs in EXACT scaled-integer
    // arithmetic with half-up rounding to 4 decimals — the true mean of
    // fixed-decimal values regularly lands exactly on the rounding
    // half-way point, where IEEE-double averaging is engine-dependent.
    // None (default) keeps plain floating-point aggregation.
    valueDecimals: Option[Int] = None) {
  // Reference validation: aggregation requires a bucket size and vice versa
  // (/root/reference/potoos/models/config.py:57-60).
  require(
    aggregationType.isEmpty == bucketSizeMs.isEmpty,
    "aggregation_type and bucket_size_msec must be set together")
  aggregationType.foreach { a =>
    require(TsQueryConfig.Aggregators.contains(a), s"unknown aggregator: $a")
  }
}

object TsQueryConfig {
  /** The 12-aggregator vocabulary (/root/reference/potoos/models/config.py:41). */
  val Aggregators: Set[String] = Set(
    "avg", "sum", "min", "max", "range", "count",
    "first", "last", "std.p", "std.s", "var.p", "var.s")
}

/** Mirror of the reference `AnomalyDetectionConfig`
  * (/root/reference/potoos/models/config.py:81-90). Default algorithm is
  * derivative_detector per code (config.py:86; README.md:117 disagrees —
  * code wins, SURVEY.md §2.6.3).
  */
final case class DetectorConfig(
    algorithmName: String = "derivative_detector",
    smoothingFactor: Double = Constants.DefaultSmoothingFactor,
    scoreThreshold: Option[Double] = None,
    scorePercentThreshold: Option[Double] = None,
    scoreOnly: Boolean = false,
    // D13: optional second algorithm re-scores within each anomaly window
    // to pin exact_timestamp (/root/reference/potoos/models/config.py:88-89)
    refineAlgorithmName: Option[String] = None,
    // exp_avg lag-window variant (delegate's use_lag_window path)
    emaUseLagWindow: Boolean = false,
    // absolute_threshold params
    absoluteThresholdUpper: Option[Double] = None,
    absoluteThresholdLower: Option[Double] = None,
    // diff_percent_threshold params
    percentThresholdUpper: Option[Double] = None,
    percentThresholdLower: Option[Double] = None,
    // sign_test params
    signTestWindowPoints: Int = 10,
    signTestConfidence: Double = 0.75,
    signTestOffset: Double = 0.0)
