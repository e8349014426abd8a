package graft

import graft.operators.Layout

import org.scalatest.funsuite.AnyFunSuite

/** Z-order interleave correctness (known bit patterns, range guard,
  * quad-tree bucketing) and range-bound arithmetic (balanced sizes,
  * straddling heavy values, n > N degenerate buckets).
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("layout-spec")
  import spark.implicits._

  test("zValue interleaves bits: x at even, y at odd positions") {
    // x=0b101, y=0b011 → z = 1·2⁰ + 1·2¹ + 0·2² + 1·2³ + 1·2⁴ + 0·2⁵ = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"), bits = 3).as("z"))
      .collect().head.getLong(0)
    assert(got == 27L)
  }

  test("zValue raises on out-of-range input instead of wrapping") {
    val ex = intercept[Exception] {
      Seq((8L, 0L)).toDF("x", "y")
        .select(Layout.zValue(org.apache.spark.sql.functions.col("x"),
          org.apache.spark.sql.functions.col("y"), bits = 3))
        .collect()
    }
    assert(ex.getMessage.contains("input outside"))
  }

  test("zorder buckets are the quad-tree tile: same tile → same bucket") {
    // bits=4, buckets=4 → bucket = top 2 z-bits = (y_msb, x_msb): the
    // 2×2 macro-quadrant of the 16×16 grid.
    val df = Seq(
      (1L, 2L, 3L), (2L, 7L, 5L), // x<8, y<8 → bucket 0
      (3L, 9L, 3L), // x>=8, y<8 → bucket 1 (x msb at even position 8 → z bit 9? no: bit 3 of x → pos 6; top bits: pos7=y3, pos6=x3)
      (4L, 2L, 12L) // y>=8 → bucket 2
    ).toDF("id", "x", "y")
    val got = Layout.zorder(df, "x", "y", bits = 4, buckets = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("z_bucket")).toMap
    assert(got(1L) == 0L && got(2L) == 0L)
    assert(got(3L) == 1L)
    assert(got(4L) == 2L)
  }

  test("zValue round-trips: de-interleaving recovers (x, y) for 2000 random pairs") {
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(11)
    val pairs = (1 to 2000).map(_ => (rng.nextInt(1 << 16).toLong, rng.nextInt(1 << 16).toLong))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), bits = 16).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val dx = (0 until 16).map(b => ((z >> (2 * b)) & 1L) << b).sum
      val dy = (0 until 16).map(b => ((z >> (2 * b + 1)) & 1L) << b).sum
      assert(dx == x && dy == y, s"z=$z decoded to ($dx,$dy), expected ($x,$y)")
    }
  }

  test("zValueN round-trips for 3 dimensions; rejects > 63 total bits") {
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(13)
    val rows = (1 to 500).map(_ =>
      (rng.nextInt(1 << 11).toLong, rng.nextInt(1 << 11).toLong, rng.nextInt(1 << 11).toLong))
    val got = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.zValueN(Seq(col("a"), col("b"), col("c")), bits = 11).as("z"))
      .collect()
    got.foreach { r =>
      val (a, b, c, z) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      def dim(i: Int) = (0 until 11).map(bb => ((z >> (3 * bb + i)) & 1L) << bb).sum
      assert(dim(0) == a && dim(1) == b && dim(2) == c)
    }
    val ex = intercept[IllegalArgumentException] {
      Layout.zValueN(Seq(col("a"), col("b"), col("c")), bits = 22)
    }
    assert(ex.getMessage.contains("exceeds"))
  }

  test("rangeBounds: balanced sizes summing to N, ordered non-overlapping ranks") {
    val df = (1 to 103).map(i => i.toLong * 7 % 101).toDF("v")
    val got = Layout.rangeBounds(df, "v", n = 8)
      .orderBy("bucket").collect()
    assert(got.length == 8)
    val sizes = got.map(_.getAs[Long]("n_rows"))
    assert(sizes.sum == 103L)
    assert(sizes.max - sizes.min <= 1)
    // lo/hi are monotone across buckets
    val lohi = got.map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    lohi.sliding(2).foreach { case Array((_, h1), (l2, _)) => assert(h1 <= l2) }
  }

  test("rangeBounds: a heavy value straddling a boundary appears in both buckets") {
    val df = Seq(1L, 1L, 1L, 1L, 2L, 3L).toDF("v")
    val got = Layout.rangeBounds(df, "v", n = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("n_rows")))
    assert(got.toSeq == Seq((1L, 1L, 1L, 3L), (2L, 1L, 3L, 3L)))
  }

  test("rangeBounds: n > N emits only the non-empty rank buckets") {
    val df = Seq(10L, 20L, 30L).toDF("v")
    val got = Layout.rangeBounds(df, "v", n = 5).orderBy("bucket").collect()
    assert(got.map(_.getAs[Long]("bucket")).toSeq == Seq(2L, 4L, 5L))
    assert(got.map(_.getAs[Long]("n_rows")).sum == 3L)
  }

  test("rangeBounds: no unpartitioned Window at any point in the physical plan") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val df = (1 to 5000).map(i => i.toLong * 2654435761L % 1000003L).toDF("v")
    val q = Layout.rangeBounds(df, "v", n = 32)
    q.collect() // finalizes the AQE plan
    // AQE wraps finished stages in leaf QueryStageExec nodes — a plain
    // TreeNode.collect stops at them, so recurse through every wrapper
    def windows(p: SparkPlan): Seq[WindowExec] = {
      val self = p match { case w: WindowExec => Seq(w); case _ => Nil }
      val nested = p match {
        case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
        case s: QueryStageExec => windows(s.plan)
        case r: ReusedExchangeExec => windows(r.child)
        case _ => Nil
      }
      self ++ nested ++ p.children.flatMap(windows)
    }
    val ws = windows(q.queryExecution.executedPlan)
    assert(ws.nonEmpty, "expected the within-partition cumulation window")
    ws.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned WindowExec in rangeBounds plan: $w"))
  }

  test("rangeBounds: distributed prefix sum matches a single-window oracle on a near-unique column") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(17)
    val vals = (1 to 4000).map(_ => rng.nextDouble() * 1e6)
    val df = vals.toDF("v")
    val got = Layout.rangeBounds(df, "v", n = 16).orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Double]("lo"), r.getAs[Double]("hi"), r.getAs[Long]("n_rows")))
    // oracle: the pre-r6 single global window formulation
    val counts = df.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("v"))
    val spans = counts
      .withColumn("cum", sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_lo", col("cum") - col("cnt") + 1)
    val total = counts.agg(sum("cnt").as("N"))
    val buckets = spark.range(1, 17).toDF("bucket")
      .crossJoin(broadcast(total))
      .withColumn("r_lo", expr("(bucket - 1) * N DIV 16 + 1"))
      .withColumn("r_hi", expr("bucket * N DIV 16"))
      .where(col("r_hi") >= col("r_lo"))
    val exp = spans
      .join(broadcast(buckets), col("cum_lo") <= col("r_hi") && col("cum") >= col("r_lo"))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        min(col("r_hi") - col("r_lo") + 1).as("n_rows"))
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Double]("lo"), r.getAs[Double]("hi"), r.getAs[Long]("n_rows")))
    assert(got.toSeq == exp.toSeq)
  }

  test("rangeBounds: string column — proxy split preserves exact rank cuts incl. nulls") {
    val df = (Seq.tabulate(300)(i => f"doc_${(i * 37) % 100}%03d_${i}%04d") ++ Seq(null, null))
      .toDF("v")
    val got = Layout.rangeBounds(df, "v", n = 7).orderBy("bucket").collect()
    val sizes = got.map(_.getAs[Long]("n_rows"))
    assert(sizes.sum == 302L)
    assert(sizes.max - sizes.min <= 1)
    val his = got.flatMap(r => Option(r.getAs[String]("hi")))
    assert(his.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
  }
}
