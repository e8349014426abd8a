package graft

import org.scalatest.funsuite.AnyFunSuite

class TablesSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("tables-spec")
  val sf = "/root/testdata/sf0.001"

  test("events loads with normalized ts_ms") {
    val ev = Tables.events(spark, sf)
    val row = ev.selectExpr("min(ts_ms)", "max(ts_ms)", "count(*)").head()
    assert(row.getLong(2) > 0)
    // 2024-01-01T00:00:00Z = 1704067200000
    assert(row.getLong(0) >= 1704067200000L)
    assert(row.getLong(1) < 1706659200000L) // < 2024-01-31
  }

  test("lineitem loads") {
    assert(Tables.lineitem(spark, sf).count() > 1000)
  }
}
