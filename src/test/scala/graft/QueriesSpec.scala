package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catch-all driver-surface smoke: every registered query must run
  * end-to-end (no analysis errors, no runtime throws) and every oracle
  * must reference a registered query. The per-query VALUE checks live in
  * the DuckDB oracle gate; this spec keeps a broken query from ever
  * reaching the driver in the first place.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("queries-spec")
  private val sf = "/root/testdata/sf0.001"

  test("every SparkEntry query runs end-to-end at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sf).count()
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"queries failed:\n${failures.mkString("\n")}")
  }

  test("every oracle belongs to a registered query; the flagship has an oracle") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    assert(SparkEntry.oracleSql.size >= 52, "oracle coverage regressed")
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
