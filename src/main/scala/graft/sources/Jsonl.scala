package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
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
  *   poison.** Both readers return the clean rows plus reject
  *   accounting — bare DROPMALFORMED hides data loss; FAILFAST makes one
  *   bad crawl line kill a day's ingest.
  * - **Reject counts are FULL-SCHEMA counts.** DROPMALFORMED's notion of
  *   "malformed" depends on which columns the parse materializes: a row
  *   whose JSON is syntactically valid but type-wrong in one field
  *   (`doc_id: "abc"`) survives a parse that prunes that field away and
  *   dies in one that reads it. Every count here forces the full pinned
  *   schema (the metric/count expression references every column), so
  *   the number reported is the number of rows a full-shape consumer
  *   actually receives.
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

  /** An aggregate whose VALUE depends on every pinned column, so no
    * optimizer rule can prune the scan under it: `count(expr)` is NOT
    * enough — xxhash64 is non-nullable, so Catalyst rewrites the count
    * to `count(1)` and prunes the schema to zero columns, reverting to
    * the partial-schema drop criterion this probe exists to defeat.
    * `max` genuinely needs the hash values, which need every column,
    * which makes DROPMALFORMED judge each line against the FULL schema.
    */
  private def fullSchemaProbe =
    max(xxhash64(DocumentsSchema.fieldNames.map(col): _*))

  /** Read a JSONL corpus with the pinned schema: returns (clean rows in
    * the `documents` shape, count of malformed lines). The scan runs
    * DROPMALFORMED — but the drop is NOT silent: the reject count is
    * line count − clean count, where the line count is a text scan that
    * never parses JSON and the clean count is a FULL-SCHEMA parse (see
    * object doc) — so type-malformed rows count as rejects too, matching
    * what a full-shape consumer receives.
    *
    * This eager form costs one JSON parse up front plus the caller's own
    * consumption pass. An ingest that will scan the corpus exactly once
    * should use [[readDocumentsCounted]], which piggybacks the clean
    * count on the caller's pass via `observe()` — one parse total.
    */
  def readDocuments(spark: SparkSession, path: String): (DataFrame, Long) = {
    val clean = spark.read
      .schema(DocumentsSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)
    val totalLines = spark.read.text(path).where(length(col("value")) > 0).count()
    val cleanRows = clean.agg(count(lit(1)), fullSchemaProbe).head.getLong(0)
    (clean, totalLines - cleanRows)
  }

  /** Single-parse read: `docs` plus deferred reject accounting. */
  final case class JsonlScan(docs: DataFrame, totalLines: Long, observation: Observation) {
    /** Rejected-line count. Valid only AFTER the caller has run an
      * action over `docs` (`Observation.get` blocks until one
      * completes) — the count rides the caller's own pass, which is the
      * point: zero extra parse jobs.
      */
    def rejects: Long = totalLines - observation.get("clean_rows").asInstanceOf[Long]
  }

  /** The scale path: one text scan for the line count (never parses
    * JSON) and ZERO dedicated parse passes — the clean-row count is an
    * `observe()` metric collected during the CALLER's first action over
    * `docs`, and the metric expression references every pinned column so
    * the parse (and therefore the drop criterion) is full-schema even
    * when the consumer projects a subset. `readDocuments` pays an extra
    * eager parse for an immediate count; this form is what a 100 TB
    * ingest should run.
    */
  def readDocumentsCounted(spark: SparkSession, path: String): JsonlScan = {
    val obs = Observation()
    val clean = spark.read
      .schema(DocumentsSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)
      .observe(obs, count(lit(1)).as("clean_rows"), fullSchemaProbe.as("schema_probe"))
    val totalLines = spark.read.text(path).where(length(col("value")) > 0).count()
    JsonlScan(clean, totalLines, obs)
  }
}
