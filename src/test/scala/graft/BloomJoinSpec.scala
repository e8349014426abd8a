package graft

import graft.ext.Sketches
import graft.operators.BloomJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom semi-join reduction and CMS join-size estimation: the two
  * sketch-driven join optimizations.
  */
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("bloom-join-spec")
  import spark.implicits._

  test("bloom prune: no false negatives — every dim key survives the fact filter") {
    val dim = (1L to 100L).map(i => i * 7).toDF("k")
    val fact = (1L to 2000L).toDF("k")
    val bits = BloomJoin.bitsetWords(dim, "k", mBits = 1 << 12, k = 3)
    val kept = BloomJoin.prune(fact, "k", bits, mBits = 1 << 12, k = 3)
      .collect().map(_.getLong(0)).toSet
    val dimKeys = dim.collect().map(_.getLong(0)).toSet
    val matching = fact.collect().map(_.getLong(0)).toSet intersect dimKeys
    assert((matching -- kept).isEmpty, "a true match must never be pruned")
  }

  test("bloom prune: selective dim prunes most of the fact side (low fp rate)") {
    val dim = (1L to 50L).toDF("k")
    val fact = (1L to 10000L).toDF("k")
    val bits = BloomJoin.bitsetWords(dim, "k", mBits = 1 << 14, k = 3)
    val kept = BloomJoin.prune(fact, "k", bits, mBits = 1 << 14, k = 3).count()
    // 50 true + fp; at m/n = 327, k=3 the fp rate is ~1e-5
    assert(kept < 100, s"expected ~50 rows to survive, got $kept")
  }

  test("bloom-pruned join result equals the plain join") {
    val dim = (1L to 40L).map(i => (i * 13, s"d$i")).toDF("dk", "payload")
    val fact = (1L to 3000L).map(i => (i, i * 2)).toDF("fk", "v")
    val pruned = BloomJoin.bloomPrunedJoin(fact, dim, "fk", "dk", mBits = 1 << 12, k = 3)
      .select("fk", "v", "payload").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "v", "payload").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(pruned == plain)
  }

  test("cms join-size estimate upper-bounds the exact size and is tight at low collision rates") {
    val a = (1 to 1000).map(i => s"k${i % 20}").toDF("k") // 20 keys × 50
    val b = (1 to 300).map(i => s"k${i % 10}").toDF("k") // 10 keys × 30
    val est = Sketches.cmsJoinSizeEstimate(
        Sketches.cmsCells(a, "k", 4, 1024), Sketches.cmsCells(b, "k", 4, 1024))
      .collect().head.getLong(0)
    val exact = 10 * 50 * 30 // overlapping keys k0..k9, 50·30 pairs each
    assert(est >= exact, "CMS inner product can never undercount")
    assert(est <= (exact * 1.05).toLong, s"with width >> keys the estimate should be near-exact: $est vs $exact")
  }

  test("cms join-size estimate: disjoint key sets give zero") {
    val a = (1 to 100).map(i => s"a$i").toDF("k")
    val b = (1 to 100).map(i => s"b$i").toDF("k")
    // width >> keys so rows with no colliding cells exist
    val est = Sketches.cmsJoinSizeEstimate(
        Sketches.cmsCells(a, "k", 4, 65536), Sketches.cmsCells(b, "k", 4, 65536))
      .collect().head.getLong(0)
    assert(est == 0L, s"disjoint sides must estimate 0 (got $est)")
  }
}
