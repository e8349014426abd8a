package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (where
  * SQL-expressible) a DuckDB oracle over the same parquet tables. The
  * driver hash-compares both at sf0.01 (BASELINE.md).
  *
  * Conventions shared by both sides so hashes can match:
  *  - timestamps surface as epoch-millis BIGINT columns named `*_ms`
  *    (identical floor-truncation from the parquet ns/µs values);
  *  - computed DOUBLE columns are round(x, 4) on BOTH sides (raw stored
  *    doubles pass through unrounded); money-scale sums use round(x, 2);
  *  - every aggregate/computed column carries the same alias in the Spark
  *    code and the SQL;
  *  - result sets are deterministic: LIMIT only behind a total order with
  *    unique tie-breaks.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {
  lazy val all: Seq[Q] =
    TsQueries.all ++ DetectQueries.all ++ RelationalQueries.all ++ ExtQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}

/** Shared time constants for the `events` table (2024-01 UTC). */
object T {
  val Day = 86400000L
  val From = 1704412800000L // 2024-01-05T00:00:00Z
  val To = 1705708800000L // 2024-01-20T00:00:00Z
}
