package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-STATIC enrichment — the third (and cheapest) streaming join
  * shape, completing the taxonomy next to the inner and left-outer
  * stream-stream interval joins: a fact stream joined to a bounded
  * dimension table. The dimension rides a BROADCAST to every micro-batch
  * executor, so there is NO state store, no watermark requirement, and
  * the stream side never shuffles — at 100 TB/day of events against a
  * million-row dimension this is the join to reach for first; the
  * stream-stream machinery is only for two genuinely unbounded sides.
  */
object EnrichStream {

  /** One fact arrival for `enrichReplay`. */
  final case class FactEvent(key: Long, tsMs: Long, value: Double)

  /** Left-join the fact stream to the static dimension on `keyCol`,
    * broadcasting the dimension: facts with no dimension row pass through
    * with nulls (dropping them silently is the classic enrichment bug —
    * an incomplete dimension would quietly shrink the stream).
    */
  def enrich(stream: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol), "left")

  /** Bounded batch-replay for the driver oracle (the `Replay.runSink`
    * contract): facts feed a MemoryStream in ts-ordered chunks against
    * the static dimension; no sentinels are needed because the join is
    * stateless. Output must equal the batch left join on the same rows.
    */
  def enrichReplay(
      facts: Seq[FactEvent],
      dim: DataFrame,
      spark: org.apache.spark.sql.SparkSession,
      chunks: Int): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext
    val sorted = facts.sortBy(e => (e.tsMs, e.key))
    val mem = MemoryStream[FactEvent]
    val out = enrich(mem.toDS().toDF(), dim, "key")
    Replay.runSink(spark, out)(q => Replay.feedChunks(q, mem, Replay.chunked(sorted, chunks)))
  }
}
