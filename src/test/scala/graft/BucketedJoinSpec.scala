package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bucketed-storage contract: once both sides are written
  * bucketed+sorted on the join key, the equi-join plans with NO shuffle
  * of either side — even when broadcast is disabled, the case where an
  * unbucketed join would pay two full exchanges.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("bucketed-spec")
  private val sf = "/root/testdata/sf0.001"

  private def withConf[A](k: String, v: String)(body: => A): A = {
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body
    finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }

  test("bucketed fact-fact join plans with zero shuffles, even without broadcast") {
    val li = Bucketed.ensureBucketed(spark, sf, "lineitem", "l_orderkey", buckets = 8)
    val ord = Bucketed.ensureBucketed(spark, sf, "orders", "o_orderkey", buckets = 8)
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val joined = spark.table(li)
        .join(spark.table(ord), col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
      assert(exchanges == 0, s"bucketed join must not shuffle either side:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected a bucket-wise sort-merge join:\n$p")
      // the join result itself matches the unbucketed join
      val plain = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() == plain.count())
    }
  }

  test("ensureBucketed is idempotent and reuses the catalog table") {
    val n1 = Bucketed.ensureBucketed(spark, sf, "orders", "o_orderkey", buckets = 8)
    val n2 = Bucketed.ensureBucketed(spark, sf, "orders", "o_orderkey", buckets = 8)
    assert(n1 == n2)
    assert(spark.catalog.tableExists(n1))
  }

  test("grouping on the bucket key after the join adds no further exchange for the agg input")  {
    val li = Bucketed.ensureBucketed(spark, sf, "lineitem", "l_orderkey", buckets = 8)
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      // aggregation keyed by the bucket column rides the bucket layout too
      val agg = spark.table(li).groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      val p = agg.queryExecution.executedPlan.toString
      val exchanges = "(?<!Broadcast)Exchange ".r.findAllIn(p).size
      assert(exchanges == 0, s"groupBy on the bucket key must not shuffle:\n$p")
    }
  }
}
