package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to the real core count so driver-run benches (no env var)
    // measure the same configuration we record in BENCH_NOTES.md.
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // replay-harness queries exist for the correctness gate: they feed a
    // MemoryStream from the driver one micro-batch at a time, so their
    // wall time measures the replay harness, not a distributed operator —
    // excluded here (Verify still runs them)
    val skip = Set("anomaly_stream_monitor", "anomaly_stream_calibrated", "anomaly_stream_cusum", "anomaly_stream_hw", "anomaly_stream_control", "anomaly_stream_seasonal", "stream_dedup", "stream_neardup", "stream_sessions",
      "stream_join", "stream_join_outer", "stream_join_right", "stream_join_full", "stream_enrich", "stream_kmv",
      "stream_scene_cuts", "stream_cms", "stream_drift")
    // optional subset (comma-separated names): targeted re-measurement of
    // specific rows without a 162-query full pass
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.filterNot(q => skip(q._1))
      .filter(q => only.forall(_.contains(q._1))).sortBy(_._1)
    // warm pass: JIT + codegen + parquet footer caches (BASELINE.md
    // measurement plan: warm JVM, median of 3)
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache(); System.gc()
    val results = ordered.map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // isolate queries from each other's leftover broadcasts/shuffle state
      spark.catalog.clearCache()
      System.gc()
      name -> times(1) // median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // full per-query artifact: the driver's BENCH_r*.json keeps only a
    // truncated stdout tail, losing the first ~100 per-query numbers —
    // this file makes round-over-round comparison mechanical. A
    // BENCH_ONLY subset run must NOT clobber the full-round artifact it
    // exists to preserve: subset runs only write when given an explicit
    // SPARK_GRAFT_BENCH_OUT target.
    // bench_full.json stays the "latest" pointer; the round-stamped copy
    // makes history append-only instead of a single mutable file
    // (bump Round per build round).
    val Round = "r13"
    val out = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .map(Seq(_))
      .getOrElse(if (only.isEmpty) Seq("bench_full.json", s"bench_full_$Round.json") else Seq.empty)
    out.foreach { f =>
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(f),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Exception => System.err.println(s"[bench] $f write failed: $e") }
    }
    spark.stop()
  }
}
