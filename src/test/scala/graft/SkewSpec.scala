package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("skew-spec")
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def skewedFact = Tables.lineitem(spark, sf)
    .withColumn("skew_key",
      when(col("l_orderkey") % 5 > 0, lit(1L)).otherwise(col("l_suppkey")))

  private def dim = Tables.supplier(spark, sf).select("s_suppkey", "s_name")

  test("salted join result equals the plain join exactly") {
    val salted = Skew.saltedJoin(
      skewedFact, dim, "skew_key", "s_suppkey",
      Seq(col("l_orderkey"), col("l_linenumber")), salts = 16)
      .select("l_orderkey", "l_linenumber", "s_name")
    val plain = skewedFact
      .join(dim, col("skew_key") === col("s_suppkey"))
      .select("l_orderkey", "l_linenumber", "s_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("the hot key is spread across many salt values") {
    val salted = skewedFact
      .withColumn("_fsalt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(16)))
    val hotSpread = salted.where(col("skew_key") === 1L)
      .groupBy("_fsalt").count().collect()
    assert(hotSpread.length >= 12, s"hot key must hit most of the 16 salts, got ${hotSpread.length}")
    val counts = hotSpread.map(_.getLong(1))
    assert(counts.max < 3L * counts.min + 16,
      s"salt distribution too uneven: ${counts.sorted.mkString(",")}")
  }

  test("salted plan shuffles on (key, salt), not on the bare hot key") {
    val p = Skew.saltedJoin(
      skewedFact, dim.hint("merge"), "skew_key", "s_suppkey",
      Seq(col("l_orderkey"), col("l_linenumber")), salts = 16)
      .queryExecution.executedPlan.toString
    assert(p.contains("_fsalt") && p.contains("hashpartitioning(skew_key"),
      s"expected a (skew_key, _fsalt) exchange in:\n$p")
  }
}
