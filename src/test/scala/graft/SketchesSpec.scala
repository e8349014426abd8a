package graft

import graft.ext.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch properties: HLL estimate accuracy, duplicate-insensitivity,
  * and max-mergeability; CMS upper-bound guarantee and sum-mergeability.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("sketches-spec")
  import spark.implicits._

  private val P = 8

  test("hll: estimate within 15% on 5000 distinct values (p=8 → σ≈6.5%)") {
    val vals = (1 to 5000).map(i => ("g", s"value-$i")).toDF("grp", "v")
    val est = Sketches.hllEstimate(Sketches.hllRegisters(vals, "grp", "v", P), "grp", P)
      .collect().head.getAs[Double]("est_distinct")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15, s"estimate $est too far from 5000")
  }

  test("hll: duplicates do not move the estimate") {
    val once = (1 to 2000).map(i => ("g", s"v$i")).toDF("grp", "v")
    val thrice = (1 to 3).flatMap(_ => (1 to 2000).map(i => ("g", s"v$i"))).toDF("grp", "v")
    val e1 = Sketches.hllEstimate(Sketches.hllRegisters(once, "grp", "v", P), "grp", P)
      .collect().head.getAs[Double]("est_distinct")
    val e3 = Sketches.hllEstimate(Sketches.hllRegisters(thrice, "grp", "v", P), "grp", P)
      .collect().head.getAs[Double]("est_distinct")
    assert(e1 == e3)
  }

  test("hll: registers of two halves merge by max into the whole-corpus registers") {
    val a = (1 to 1500).map(i => ("g", s"v$i")).toDF("grp", "v")
    val b = (1000 to 2500).map(i => ("g", s"v$i")).toDF("grp", "v")
    val whole = Sketches.hllRegisters(a.union(b), "grp", "v", P)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val merged = Sketches.hllRegisters(a, "grp", "v", P)
      .union(Sketches.hllRegisters(b, "grp", "v", P))
      .groupBy("grp", "bucket").agg(max("register").as("register"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(whole == merged)
  }

  test("cms: point estimates never underestimate; exact for isolated heavy hitters") {
    val toks = (Seq.fill(500)("heavy") ++ (1 to 300).map(i => s"rare$i")).toDF("wd")
    val cells = Sketches.cmsCells(toks, "wd", depth = 4, width = 256)
    val probes = (Seq("heavy", "rare1", "rare2", "absent")).toDF("wd")
    val est = Sketches.cmsEstimate(cells, probes, "wd", depth = 4, width = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("heavy") >= 500L)
    assert(est("rare1") >= 1L && est("rare2") >= 1L)
    assert(est("absent") >= 0L)
    // upper bound is tight for the heavy hitter at this load factor
    assert(est("heavy") <= 500L + 300L)
  }

  test("cms: cells of two corpora merge by sum") {
    val a = (1 to 400).map(i => s"w${i % 50}").toDF("wd")
    val b = (1 to 300).map(i => s"w${i % 30}").toDF("wd")
    val whole = Sketches.cmsCells(a.union(b), "wd", depth = 2, width = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = Sketches.cmsCells(a, "wd", depth = 2, width = 128)
      .union(Sketches.cmsCells(b, "wd", depth = 2, width = 128))
      .groupBy("row_idx", "col_idx").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole == merged)
  }
}
