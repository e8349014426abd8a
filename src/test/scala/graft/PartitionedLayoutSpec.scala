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
}
