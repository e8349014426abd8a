package graft.client

import graft.config.{DetectorConfig, TsQueryConfig}
import graft.detect.Detectors
import graft.model.TsSample
import graft.ts.{TsAlgebra, TsCols}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The three result facets of the reference `AnomalyResult`
  * (/root/reference/potoos/models/anomaly.py:39-45) as Datasets — kept
  * lazy/distributed instead of collected client-side.
  */
final case class MonitorResult(scores: DataFrame, anomalies: DataFrame, metadata: DataFrame)

/** Engine facade — the Spark-native `PotoosClient.monitor()`
  * (EP2, /root/reference/potoos/client.py:113-139), generalized from
  * one-series-per-call to all series in the input at once.
  *
  * Pipeline: range-query algebra (filters/aggregation) → min-cardinality
  * guard → detector scoring → thresholding → anomaly-window assembly →
  * metadata. Empty input yields empty results (D16) rather than an error;
  * series shorter than 4 points are dropped by the guard (D0, relational
  * form of the reference's ValueError).
  */
/** Stateful client mirroring the reference's constructor-defaults +
  * per-call-override shape (EP2: ts_config resolution at
  * /root/reference/potoos/client.py:130; tested by the reference's
  * config-override cases, tests/test_client.py:205-267).
  */
final class GraftClient(
    val defaultTsCfg: TsQueryConfig = TsQueryConfig(),
    val defaultDetCfg: DetectorConfig = DetectorConfig()) {

  def monitor(
      df: DataFrame,
      cols: TsCols = TsCols(),
      tsCfg: Option[TsQueryConfig] = None,
      detCfg: Option[DetectorConfig] = None,
      baseline: Option[DataFrame] = None): MonitorResult =
    Graft.monitor(df, cols, tsCfg.getOrElse(defaultTsCfg), detCfg.getOrElse(defaultDetCfg), baseline)
}

object Graft {

  def monitor(
      df: DataFrame,
      cols: TsCols = TsCols(),
      tsCfg: TsQueryConfig = TsQueryConfig(),
      detCfg: DetectorConfig = DetectorConfig(),
      baseline: Option[DataFrame] = None): MonitorResult = {
    val spark = df.sparkSession
    import spark.implicits._
    val queried = TsAlgebra.query(df, tsCfg, cols)
    val points = Detectors
      .minPointsGuard(
        // any key type (Redis-style `host:metric` strings, numeric ids)
        // casts losslessly to the engine's string series key
        queried.select(
          col(cols.key).cast("string").as("seriesKey"),
          col(cols.ts).cast("long").as("tsMs"),
          col(cols.value).cast("double").as("value")).as[TsSample])
      .as[TsSample]
    val scores = Detectors.score(points, detCfg, baseline)
    val anomalies =
      if (detCfg.scoreOnly) spark.emptyDataset[graft.model.Anomaly].toDF()
      else {
        val wins = Detectors.anomalies(Detectors.withThreshold(scores, detCfg))
        detCfg.refineAlgorithmName match {
          case Some(r) =>
            Detectors.refineExact(points, wins, detCfg.copy(algorithmName = r, refineAlgorithmName = None))
          case None => wins
        }
      }
    MonitorResult(scores, anomalies, Detectors.metadata(points, anomalies, detCfg.algorithmName))
  }
}
