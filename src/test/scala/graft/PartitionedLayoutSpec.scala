package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB storage story, demonstrated: a date-partitioned events
  * layout gives the F1 time-range predicate partition PRUNING — a day
  * query touches one directory, not the whole table. At cluster scale
  * this is the difference between scanning 100 TB and scanning ~3 TB/day.
  */
class PartitionedLayoutSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("partitioned-layout-spec")

  test("date-partitioned events layout prunes partitions for a day query") {
    val dir = Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_date", to_date(timestamp_millis(col("ts_ms"))))
    ev.write.partitionBy("event_date").mode("overwrite").parquet(dir)

    val back = spark.read.parquet(dir)
    val dayQuery = back.where(col("event_date") === "2024-01-10")
    val planStr = dayQuery.queryExecution.executedPlan.toString

    assert(planStr.contains("PartitionFilters"), "partition filter should be recognized")
    assert(
      planStr.contains("(event_date") && planStr.contains("2024-01-10"),
      s"day predicate should prune partitions:\n$planStr")

    // pruning is real: the day query reads a strict subset of the files
    val allFiles = back.select(input_file_name()).distinct().count()
    val dayFiles = dayQuery.select(input_file_name()).distinct().count()
    assert(dayFiles >= 1 && dayFiles < allFiles, s"day=$dayFiles all=$allFiles")

    // and TS queries run identically over the partitioned layout
    val n = graft.ts.TsAlgebra
      .query(
        back.withColumn("ts_ms", col("ts_ms")),
        graft.config.TsQueryConfig(
          fromTimeMs = Some(1704844800000L), toTimeMs = Some(1704931199999L)), // 2024-01-10 UTC
        graft.ts.TsCols())
      .count()
    assert(n > 0)
  }

  test("bucket-by-key layout: the detector fold runs with ZERO shuffle and identical results") {
    import spark.implicits._
    import graft.detect.{ExpAvgKernel, KeyedFold}
    import graft.model.TsSample
    val warehouse = Files.createTempDirectory("graft_bucketed").toString
    val pts = Tables.events(spark, "/root/testdata/sf0.001")
      .select(
        col("user_id").cast("string").as("seriesKey"),
        col("ts_ms").as("tsMs"), col("value"))
    // the 100 TB layout: fact table bucketed by series key on disk
    pts.write
      .option("path", s"$warehouse/events_bucketed")
      .bucketBy(8, "seriesKey")
      .mode("overwrite")
      .saveAsTable("events_bucketed")
    // force bucket-aware scans even when no join/agg asks for the
    // distribution (one partition per bucket)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val bucketed = spark.table("events_bucketed").as[TsSample]
      val folded = KeyedFold.foldPrePartitioned(bucketed)(() => new ExpAvgKernel(0.2))
      val plan = folded.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed fold must not shuffle:\n$plan")

      // results identical to the shuffling fold over the same data
      val viaShuffle = KeyedFold.fold(pts.as[TsSample])(() => new ExpAvgKernel(0.2))
        .collect().map(s => (s.seriesKey, s.tsMs) -> s.dev).toMap
      val viaBuckets = folded.collect().map(s => (s.seriesKey, s.tsMs) -> s.dev).toMap
      assert(viaBuckets == viaShuffle)
      assert(viaBuckets.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS events_bucketed")
    }
  }

  test("bucket-by-key layout: the custom fold node gets its shuffle elided BY CATALYST") {
    import spark.implicits._
    import graft.detect.{ExpAvgKernel, KeyedFold}
    import graft.model.TsSample
    val warehouse = Files.createTempDirectory("graft_bucketed2").toString
    val pts = Tables.events(spark, "/root/testdata/sf0.001")
      .select(
        col("user_id").cast("string").as("seriesKey"),
        col("ts_ms").as("tsMs"), col("value"))
    pts.write
      .option("path", s"$warehouse/events_bucketed2")
      .bucketBy(8, "seriesKey")
      .mode("overwrite")
      .saveAsTable("events_bucketed2")
    try {
      // no conf knobs, no caller assertion: foldExec DECLARES its
      // distribution need, the bucketed scan provides it, and
      // EnsureRequirements proves no exchange is required
      val bucketed = spark.table("events_bucketed2").as[TsSample]
      val folded = KeyedFold.foldExec(bucketed)(() => new ExpAvgKernel(0.2))
      val plan = folded.queryExecution.executedPlan.toString
      assert(plan.contains("KeyedFold "), s"custom node missing:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed fold must not shuffle:\n$plan")
      assert(plan.contains("Sort "), "partition-local sort is still required")

      val viaShuffle = KeyedFold.fold(pts.as[TsSample])(() => new ExpAvgKernel(0.2))
        .collect().map(s => (s.seriesKey, s.tsMs) -> s.dev).toMap
      val viaBuckets = folded.collect().map(s => (s.seriesKey, s.tsMs) -> s.dev).toMap
      assert(viaBuckets == viaShuffle)
      assert(viaBuckets.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS events_bucketed2")
    }
  }
}
