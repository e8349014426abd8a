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

  test("hll: fused shingle kernel emits the exact register table of the declarative path") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val grams = docs.select(col("source"), explode(graft.ext.Dedup.shingleArray(col("text"), 3)).as("g"))
    val declarative = Sketches.hllRegisters(grams, "source", "g", P)
      .collect().map(r => (r.getString(0), r.getAs[Long]("bucket")) -> r.getAs[Long]("register")).toMap
    val fused = Sketches.hllShingleRegisters(docs, "source", "text", n = 3, p = P)
      .collect().map(r => (r.getString(0), r.getAs[Long]("bucket")) -> r.getAs[Long]("register")).toMap
    assert(fused == declarative, {
      val d = (fused.keySet ++ declarative.keySet)
        .filter(k => fused.get(k) != declarative.get(k)).take(5)
      s"register tables differ at $d"
    })
    // short docs (< n words) contribute nothing on either path
    val tiny = Seq(("s", "one two"), ("s", "a b c")).toDF("source", "text")
    val f2 = Sketches.hllShingleRegisters(tiny, "source", "text", n = 3, p = P).collect()
    assert(f2.length == 1) // only "a b c" has a 3-gram
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

  test("histogram: quantile estimates within one bin width of the exact percentile") {
    // values 0.01 .. 100.00 uniformly; unitScale 100 → units 1..10000,
    // binUnits 100 → 100 bins of width 1.00
    val vals = (1 to 10000).map(i => ("g", i / 100.0)).toDF("grp", "v")
    val cells = Sketches.histogramCells(vals, "grp", "v", unitScale = 100, binUnits = 100L, bins = 100)
    val qs = Sketches.histogramQuantiles(cells, "grp", Seq(500, 900, 990), unitScale = 100, binUnits = 100L)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(math.abs(qs(500L) - 50.0) <= 1.0, s"p50 ${qs(500L)}")
    assert(math.abs(qs(900L) - 90.0) <= 1.0, s"p90 ${qs(900L)}")
    assert(math.abs(qs(990L) - 99.0) <= 1.0, s"p99 ${qs(990L)}")
  }

  test("histogram: cells of two halves merge by sum into the whole-input cells") {
    val a = (1 to 5000).map(i => ("g", i / 100.0)).toDF("grp", "v")
    val b = (3000 to 8000).map(i => ("g", i / 100.0)).toDF("grp", "v")
    val whole = Sketches.histogramCells(a.union(b), "grp", "v", 100, 100L, 100)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val merged = Sketches.mergeHistograms(
        Sketches.histogramCells(a, "grp", "v", 100, 100L, 100)
          .unionByName(Sketches.histogramCells(b, "grp", "v", 100, 100L, 100)),
        "grp")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(whole == merged)
  }

  test("histogram: out-of-range values clamp into the edge bins") {
    val vals = Seq(("g", -5.0), ("g", 0.5), ("g", 99.5), ("g", 250.0)).toDF("grp", "v")
    val cells = Sketches.histogramCells(vals, "grp", "v", 100, 100L, 100)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(cells(0L) == 2L, "negative clamps to bin 0") // -5.0 and 0.5
    assert(cells(99L) == 2L, "overflow clamps to the last bin") // 99.5 and 250.0
  }

  private val K = 128

  test("kmv: estimate within 25% on 5000 distinct values (k=128 → σ≈8.9%)") {
    val vals = (1 to 5000).map(i => ("g", s"value-$i")).toDF("grp", "v")
    val est = Sketches.kmvEstimate(Sketches.kmvSketch(vals, "grp", "v", K), "grp", K)
      .collect().head.getAs[Double]("est_distinct")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"estimate $est too far from 5000")
  }

  test("kmv: exact count below k; duplicates do not move the sketch") {
    val once = (1 to 50).map(i => ("g", s"v$i")).toDF("grp", "v")
    val thrice = (1 to 3).flatMap(_ => (1 to 50).map(i => ("g", s"v$i"))).toDF("grp", "v")
    val e1 = Sketches.kmvEstimate(Sketches.kmvSketch(once, "grp", "v", K), "grp", K).collect().head
    val e3 = Sketches.kmvEstimate(Sketches.kmvSketch(thrice, "grp", "v", K), "grp", K).collect().head
    assert(e1.getAs[Double]("est_distinct") == 50.0, "under k the sketch is the exact value set")
    assert(e1.getAs[Double]("est_distinct") == e3.getAs[Double]("est_distinct"))
    assert(e1.getAs[Long]("n_vals") == e3.getAs[Long]("n_vals"))
  }

  test("kmv: sketches of two halves merge into the whole-corpus sketch") {
    val a = (1 to 1500).map(i => ("g", s"v$i")).toDF("grp", "v")
    val b = (1000 to 2500).map(i => ("g", s"v$i")).toDF("grp", "v")
    val whole = Sketches.kmvSketch(a.union(b), "grp", "v", K)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val merged = Sketches.kmvMerge(
        Sketches.kmvSketch(a, "grp", "v", K).union(Sketches.kmvSketch(b, "grp", "v", K)), "grp", K)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(whole == merged, "bottom-k of the union == bottom-k of the union of bottom-ks")
  }

  test("kmv: fused token kernel emits the exact sketch of the declarative path") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val declarative = Sketches.kmvSketch(
        docs.select(col("source"), explode(split(col("text"), " ")).as("tok")),
        "source", "tok", K)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val fused = Sketches.kmvTokenSketch(docs, "source", "text", K)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fused == declarative)
  }

  test("kmv: overlap estimates track exact Jaccard and union within the k=128 error band") {
    // |A| = 3000, |B| = 5000, |A∩B| = 1000 → J = 1/7, |A∪B| = 7000
    val a = (1 to 3000).map(i => ("a", s"v$i")).toDF("grp", "v")
    val b = (2001 to 7000).map(i => ("b", s"v$i")).toDF("grp", "v")
    val ov = Sketches.kmvOverlap(Sketches.kmvSketch(a.union(b), "grp", "v", K), "grp", K)
      .collect().head
    val j = ov.getAs[Double]("jaccard_est")
    val u = ov.getAs[Double]("union_est")
    assert(math.abs(j - 1000.0 / 7000.0) < 0.12, s"jaccard_est $j vs exact ${1000.0 / 7000.0}")
    assert(math.abs(u - 7000.0) / 7000.0 < 0.25, s"union_est $u vs exact 7000")
  }

  test("kmv: overlap is exact when the pair holds under k distinct values combined") {
    val a = (1 to 40).map(i => ("a", s"v$i")).toDF("grp", "v")
    val b = (21 to 60).map(i => ("b", s"v$i")).toDF("grp", "v")
    val ov = Sketches.kmvOverlap(Sketches.kmvSketch(a.union(b), "grp", "v", K), "grp", K)
      .collect().head
    assert(ov.getAs[Double]("jaccard_est") == math.rint(20.0 / 60.0 * 1e4) / 1e4)
    assert(ov.getAs[Double]("union_est") == 60.0)
  }

  test("distributionDrift: identical distribution reads 0; a planted shift reads high; hand value matches") {
    // reference: buckets 0 and 1 with 50/50 mass (col_idx keyed directly —
    // the operator consumes cell tables, bucketing is upstream)
    val ref = Seq((0L, 50L), (1L, 50L)).toDF("col_idx", "cnt")
    val wins = Seq(
      (1000L, 0L, 10L), (1000L, 1L, 10L), // window A: same 50/50 shape
      (2000L, 0L, 20L), // window B: all mass on bucket 0
      (3000L, 2L, 5L) // window C: all mass OFF the reference grid
    ).toDF("window_start", "col_idx", "cnt")
    val out = Sketches.distributionDrift(wins, ref)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1000L) == ((20L, 0L)), "matching shape: zero drift")
    // B: |20*100-50*20| + |0*100-50*20| = 2000; 2000*1000/(2*20*100) = 500
    assert(out(2000L) == ((20L, 500L)), "half the mass displaced: 500 per-mille")
    // C: on-grid |0-50*5|*2 = 500, off-grid |5*100| = 500; 1000*1000/(2*5*100) = 1000
    assert(out(3000L) == ((5L, 1000L)), "fully disjoint window: full drift, off-grid mass charged")
  }
}
