package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured (JSON) column processing — the event-properties path
  * every analytics ingest needs: typed extraction with an explicit
  * reject flag (the Jsonl source's full-schema policy, applied to an
  * embedded column instead of a file), and corpus-level key/type
  * profiling to DISCOVER the schema before pinning it.
  *
  * Scale shape: both operators are a narrow per-row parse followed by
  * one partial-aggregating shuffle — no window, no join, no collected
  * schema sample. At 100 TB the parse dominates; it runs inside the
  * scan stage (from_json is a per-row expression), so there is no extra
  * pass over the data.
  */
object SemiStructured {

  /** Parse `jsonCol` against a pinned DDL schema, carrying `_json_ok`:
    * false when the document is malformed OR any schema field is absent/
    * null — the same all-fields-present contract as the JSONL source's
    * reject ledger, so downstream aggregates can split clean/dirty
    * without re-parsing. The parsed struct lands in `_parsed`.
    */
  def typedJson(df: DataFrame, jsonCol: String, ddl: String): DataFrame = {
    val parsed = from_json(col(jsonCol), ddl, new java.util.HashMap[String, String]())
    val fields = org.apache.spark.sql.types.StructType.fromDDL(ddl).fieldNames
    val allPresent = fields
      .map(f => parsed.getField(f).isNotNull)
      .reduce[Column](_ && _)
    df.withColumn("_parsed", parsed)
      .withColumn("_json_ok", col("_parsed").isNotNull && allPresent)
  }

  /** Key histogram + type votes over a JSON column: one row per distinct
    * top-level key with presence and lexical-type counts (integer /
    * numeric pattern votes over the STRING form of each value) — the
    * schema-discovery report that decides the `typedJson` DDL. Values
    * parse as map<string,string>, so nested objects/arrays count as
    * present non-numeric strings (profile depth is one level by design:
    * at 100 TB a recursive profile is a different query over the
    * flattened child column).
    */
  def jsonKeyProfile(df: DataFrame, jsonCol: String): DataFrame =
    df
      .select(explode(
        from_json(col(jsonCol), org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")))
        .as(Seq("key", "v")))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_present"),
        sum(when(col("v").rlike("^-?[0-9]+$"), 1L).otherwise(0L)).as("n_int"),
        sum(when(col("v").rlike("^-?[0-9]+(\\.[0-9]+)?$"), 1L).otherwise(0L)).as("n_num"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"))
}
