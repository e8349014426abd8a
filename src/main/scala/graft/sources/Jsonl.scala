package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) document source — the wire format
  * web-scale text corpora actually arrive in (crawl dumps, API exports,
  * annotation deliveries), read into the same `documents` shape the rest
  * of the engine consumes.
  *
  * Scale rules encoded here rather than left to callers:
  * - **Explicit schema, never inference.** `spark.read.json` without a
  *   schema runs a FULL extra pass over the data to infer one — at
  *   100 TB that is a second corpus scan before any work starts, and
  *   inferred types drift with content (a batch whose doc_ids all fit in
  *   int downgrades the column). The schema is pinned.
  * - **Malformed lines are counted, not silently dropped and not
  *   poison.** `readDocuments` returns the clean rows plus a reject
  *   count (see its doc for how the count avoids a second parse pass) —
  *   bare DROPMALFORMED hides data loss; FAILFAST makes one bad crawl
  *   line kill a day's ingest.
  * - JSONL splits by line, so reads parallelize per-block like any text
  *   source — no single-file bottleneck (unlike multi-line JSON arrays,
  *   which are unsplittable and explicitly not supported here).
  */
object Jsonl {

  /** The pinned corpus schema (the parquet `documents` shape). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Write a document table as JSONL (one JSON object per line — what
    * `DataFrameWriter.json` emits). Round-trip losslessness for the
    * string/long corpus shape is pinned by the `src_jsonl_roundtrip`
    * gate row.
    */
  def writeDocuments(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read a JSONL corpus with the pinned schema: returns (clean rows in
    * the `documents` shape, count of malformed lines). The scan runs
    * DROPMALFORMED — but the drop is NOT silent: the reject count is
    * line count − clean count, and the line count is a text scan that
    * never parses JSON (far cheaper than a second parse pass; JSONL's
    * one-object-per-line contract makes the subtraction exact). The
    * PERMISSIVE alternative that RETAINS each bad line's bytes exists,
    * but Spark only allows querying the corrupt column off a cached
    * parse — the wrong trade for a corpus-scale scan; an ingest that
    * needs the bad bytes should quarantine-copy the files named by the
    * executor-side parse warnings instead.
    */
  def readDocuments(spark: SparkSession, path: String): (DataFrame, Long) = {
    val clean = spark.read
      .schema(DocumentsSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)
    val totalLines = spark.read.text(path).where(length(col("value")) > 0).count()
    (clean, totalLines - clean.count())
  }
}
