package graft.model

/** Core data model (SURVEY.md §1.3).
  *
  * The reference models one time series per Redis key as ordered
  * (timestamp_ms, value) samples (/root/reference/potoos/models/anomaly.py:7-12).
  * Here a series key column generalizes that to many series per Dataset —
  * at 100 TB the key is the unit of parallelism.
  *
  * The key is a STRING, matching the reference's Redis key strings
  * (/root/reference/potoos/client.py:39,115 — `host:metric`-style keys).
  * Numeric keys cast losslessly at the boundary (client.Graft casts any
  * input key column to string); the key participates only in hash
  * partitioning and per-partition sorts, never in arithmetic.
  */
final case class TsSample(seriesKey: String, tsMs: Long, value: Double)

/** Anomaly window — reference: luminol Anomaly consumed at
  * /root/reference/potoos/client.py:93 and fields at README.md:78-80.
  */
final case class Anomaly(
    seriesKey: String,
    startTsMs: Long,
    endTsMs: Long,
    anomalyScore: Double,
    exactTsMs: Long)

/** Reference: /root/reference/potoos/models/anomaly.py:15-20. */
final case class TimeRange(startMs: Long, endMs: Long, durationMs: Long)

/** Reference: /root/reference/potoos/models/anomaly.py:23-36, built at
  * client.py:100-109.
  */
final case class MetaData(
    seriesKey: String,
    algorithm: String,
    dataPointsAnalyzed: Long,
    anomaliesFound: Long,
    timeRange: TimeRange)
