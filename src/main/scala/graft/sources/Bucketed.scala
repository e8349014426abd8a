package graft.sources

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Bucketed-table source/sink surface — the storage-layout half of the
  * "co-locate joins" strategy. Writing both join sides bucketed (and
  * sorted) on the join key pins each key to a deterministic bucket file,
  * so a later equi-join on that key needs NO shuffle of either side: the
  * planner reads matching buckets pair-wise and sort-merge-joins them in
  * place. At 100 TB that converts the single biggest cost of a fact-fact
  * join — two full-table exchanges — into a metadata lookup, which is why
  * every warehouse pre-buckets its largest conformed tables.
  *
  * The write itself pays ONE shuffle-by-key (hash into `buckets` files per
  * task) — the same price as one join's exchange — amortized over every
  * subsequent join/aggregation on that key. Bucket metadata lives in the
  * session catalog; `ensureBucketed` is idempotent per (table, dir) within
  * a JVM so repeated queries reuse the files instead of rewriting.
  */
object Bucketed {

  private val built = scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Write `table` from `dir` as a parquet table bucketed+sorted by
    * `bucketCol` into the session warehouse; returns the catalog table
    * name. Safe to call repeatedly — first call per JVM writes, the rest
    * reuse.
    */
  def ensureBucketed(
      spark: SparkSession,
      dir: String,
      table: String,
      bucketCol: String,
      buckets: Int): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    // bucketCol is part of the identity: the same table bucketed on a
    // different key is a DIFFERENT physical layout
    val name = s"graft_${table}_${bucketCol.toLowerCase}_b${buckets}_$safe"
    built.getOrElseUpdate(name, {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      // the in-memory catalog forgets tables across JVMs but their
      // warehouse directories persist — clear a stale location or the
      // CREATE fails with LOCATION_ALREADY_EXISTS
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      Tables.read(spark, dir, table)
        .write
        .format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, bucketCol)
        .sortBy(bucketCol)
        .saveAsTable(name)
    })
    name
  }
}
