package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog MERGE (upsert/delete) — how a 100 TB snapshot is kept fresh
  * without rewriting it: a base snapshot plus a (much smaller) CDC delta
  * of keyed upserts and deletes fold into the next snapshot. This is the
  * compute kernel behind every MERGE INTO / CDC-apply path.
  *
  * Semantics: per key, the highest-`seq` change wins; a winning `delete`
  * removes the key; keys untouched by the delta pass through. Base rows
  * rank below every delta row (seq −1).
  *
  * Scale shape: ONE hash shuffle on the key for the per-key latest-wins
  * window (frames are tiny — 1 base row + that key's delta rows), then a
  * filter. No global sort, no driver state. At petabyte scale the same
  * plan runs partition-parallel; pair it with `sources.Bucketed` storage
  * on the key and even that one exchange disappears on the base side.
  * Deterministic: ties on `seq` are forbidden by require-ing the caller
  * pass a total per-key order (enforce upstream); base-vs-delta ties
  * cannot happen (base is seq −1, deltas must be >= 0).
  */
object Merge {

  /** Apply `delta` to `base`. Both must share `keyCol` and the payload
    * columns; `delta` additionally carries `seqCol` (change order, >= 0)
    * and `opCol` ("upsert" | "delete").
    */
  def applyChangelog(
      base: DataFrame,
      delta: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    val b = base.select(
      (col(keyCol) +: payload.map(col)) ++ Seq(lit(-1L).as("_seq"), lit("upsert").as("_op")): _*)
    val d = delta.select(
      (col(keyCol) +: payload.map(col)) ++ Seq(col(seqCol).cast("long").as("_seq"), col(opCol).as("_op")): _*)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_seq").desc)
    b.unionByName(d)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col("_op") =!= "delete")
      .select(col(keyCol) +: payload.map(col): _*)
  }
}
