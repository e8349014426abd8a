package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** Scratch profiling main for stage bisection. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("probe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val df = Tables.documents(spark, dir)
    def timeIt(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    val sh = df.select(
      col("doc_id").as("id"), col("source").as("blk"),
      explode(transform(Dedup.shingleArray(col("text"), 3), g => xxhash64(g))).as("h"))
    timeIt("explode-hash")(sh.count())
    timeIt("explode-hash-again")(sh.count())
    val joined = sh.as("a").join(
      sh.as("b"),
      col("a.blk") === col("b.blk") && col("a.h") === col("b.h") && col("a.id") < col("b.id"))
    timeIt("self-join")(joined.count())
    val grouped = joined.groupBy(col("a.id").as("da"), col("b.id").as("db")).agg(count(lit(1)).as("i"))
    timeIt("grouped")(grouped.count())
    spark.stop()
  }
}
