package graft.queries

import graft.Tables
import graft.operators.{BloomJoin, Layout, RangeJoin, Skew}
import graft.sources.Bucketed
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational coverage on the TPC-H-ish tables: scan-heavy
  * aggregation, broadcast star joins, distributed top-k, running windows,
  * anti joins. These are the bench headliners — each plan is shaped for
  * scale: filters push to parquet, small dimensions broadcast, top-k runs
  * as TakeOrderedAndProject (no global sort), aggregates partial-combine
  * before the shuffle.
  */
object RelationalQueries {

  private val cutoff = "2000-01-01"

  /** Epoch millis from a (possibly NTZ) timestamp column; session TZ is
    * UTC, so NTZ wall-clock == UTC instant, matching DuckDB's epoch_ms.
    */
  private def epochMs(c: org.apache.spark.sql.Column) = unix_millis(c.cast("timestamp"))

  /** Orders with (customer, order-day) RANGE-QUANTIZED onto the full
    * 16-bit Z-order grid from the data's own [min, max] span — the
    * prerequisite for a non-degenerate interleave (raw values leave the
    * high bits constant). Shared by the z-order layout queries.
    */
  private def zorderQuantizedOrders(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val o = Tables.orders(s, dir)
      .withColumn("_ms", epochMs(col("o_orderdate")))
      .select(
        col("o_orderkey"),
        col("o_custkey").as("cx"),
        expr("CAST(_ms DIV 86400000 AS BIGINT)").as("cy"))
    val bounds = o.agg(
      min("cx").as("x0"), max("cx").as("x1"),
      min("cy").as("y0"), max("cy").as("y1"))
    o.crossJoin(broadcast(bounds))
      .select(
        col("o_orderkey"),
        expr("CAST(((cx - x0) * 65536) DIV (x1 - x0 + 1) AS BIGINT)").as("x"),
        expr("CAST(((cy - y0) * 65536) DIV (y1 - y0 + 1) AS BIGINT)").as("y"))
  }

  /** The matching DuckDB prep + interleave, ending in `z(o_orderkey, x, y, z_value)`. */
  private val zorderQuantCte =
    """o AS (SELECT o_orderkey, o_custkey cx,
      |          epoch_ms(o_orderdate) // 86400000 cy FROM orders),
      |bn AS (SELECT min(cx) x0, max(cx) x1, min(cy) y0, max(cy) y1 FROM o),
      |q AS (SELECT o_orderkey,
      |        ((cx - x0) * 65536) // (x1 - x0 + 1) x,
      |        ((cy - y0) * 65536) // (y1 - y0 + 1) y
      |      FROM o CROSS JOIN bn),
      |z AS (SELECT o_orderkey, x, y,
      |        CAST(list_sum(list_transform(range(0, 16), b ->
      |          (((x >> b) & 1) << (2*b)) + (((y >> b) & 1) << (2*b + 1)))) AS BIGINT) z_value
      |      FROM q)""".stripMargin

  val all: Seq[Q] = Seq(
    // TPC-H Q1-style scan + aggregate; the shipdate filter and 7-column
    // projection reach the parquet scan (PushedFilters / ReadSchema).
    Q(
      "q1_agg",
      (s, dir) => {
        // money algebra in EXACT cent integers: disc_price lives on a
        // 10⁻⁴-dollar grid and charge on 10⁻⁶ — their true sums land
        // exactly on the half-cent boundary, where fp `round` is
        // engine-dependent (Spark rounds the binary expansion, DuckDB the
        // shortest decimal repr). Plain sums of the 2-decimal inputs stay
        // fp: their grid keeps them 0.005 away from any boundary.
        val qc = round(col("l_quantity") * 100, 0).cast("long")
        val pc = round(col("l_extendedprice") * 100, 0).cast("long")
        val dc = round(col("l_discount") * 100, 0).cast("long")
        val tc = round(col("l_tax") * 100, 0).cast("long")
        Tables.lineitem(s, dir)
          .where(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            sum((pc * (lit(100L) - dc)).cast("decimal(28,0)")).as("_sdp"),
            sum((pc * (lit(100L) - dc) * (lit(100L) + tc)).cast("decimal(28,0)")).as("_sch"),
            sum(qc).as("_sqc"), sum(pc).as("_spc"), sum(dc).as("_sdc"),
            count(lit(1)).as("count_order"))
          .select(
            col("l_returnflag"), col("l_linestatus"), col("sum_qty"), col("sum_base_price"),
            (expr("(_sdp + 50) DIV 100") / 100.0).as("sum_disc_price"),
            (expr("(_sch + 5000) DIV 10000") / 100.0).as("sum_charge"),
            (expr("(CAST(_sqc AS DECIMAL(38,0)) * 20000 + 100 * count_order) DIV (200 * count_order)")
              / 10000.0).as("avg_qty"),
            (expr("(CAST(_spc AS DECIMAL(38,0)) * 20000 + 100 * count_order) DIV (200 * count_order)")
              / 10000.0).as("avg_price"),
            (expr("(CAST(_sdc AS DECIMAL(38,0)) * 20000 + 100 * count_order) DIV (200 * count_order)")
              / 10000.0).as("avg_disc"),
            col("count_order"))
      },
      Some(s"""WITH b AS (SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice,
              |    CAST(round(l_quantity*100) AS BIGINT) qc,
              |    CAST(round(l_extendedprice*100) AS BIGINT) pc,
              |    CAST(round(l_discount*100) AS BIGINT) dc,
              |    CAST(round(l_tax*100) AS BIGINT) tc
              |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '$cutoff')
              |SELECT l_returnflag, l_linestatus,
              |  round(sum(l_quantity), 2) AS sum_qty,
              |  round(sum(l_extendedprice), 2) AS sum_base_price,
              |  ((sum(pc * (100 - dc)) + 50) // 100) / 100.0 AS sum_disc_price,
              |  ((sum(pc * (100 - dc) * (100 + tc)) + 5000) // 10000) / 100.0 AS sum_charge,
              |  ((sum(qc) * 20000 + 100 * count(*)) // (200 * count(*))) / 10000.0 AS avg_qty,
              |  ((sum(pc) * 20000 + 100 * count(*)) // (200 * count(*))) / 10000.0 AS avg_price,
              |  ((sum(dc) * 20000 + 100 * count(*)) // (200 * count(*))) / 10000.0 AS avg_disc,
              |  count(*) AS count_order
              |FROM b GROUP BY l_returnflag, l_linestatus""".stripMargin)
    ),
    // TPC-H Q3-style: broadcast the filtered customer dim into the
    // orders⋈lineitem join, top-10 by revenue.
    Q(
      "q3_top_orders",
      (s, dir) => {
        val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .select(col("l_orderkey"), epochMs(col("o_orderdate")).as("o_date_ms"), col("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT l_orderkey, epoch_ms(o_orderdate) AS o_date_ms,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
    ),
    // distributed top-k → TakeOrderedAndProject, unique tie-breaks
    Q(
      "q_topk",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
          .limit(20),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin)
    ),
    // running-window aggregation per supplier (integral quantities → exact)
    Q(
      "q_window_running",
      (s, dir) => {
        val w = Window
          .partitionBy("l_suppkey")
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        Tables.lineitem(s, dir)
          .select(
            col("l_suppkey"),
            epochMs(col("l_shipdate")).as("ship_ms"),
            col("l_orderkey"),
            col("l_linenumber"),
            sum("l_quantity").over(w).as("running_qty"))
      },
      Some("""SELECT l_suppkey, epoch_ms(l_shipdate) AS ship_ms, l_orderkey, l_linenumber,
             |  sum(l_quantity) OVER (PARTITION BY l_suppkey
             |                        ORDER BY l_shipdate, l_orderkey, l_linenumber) AS running_qty
             |FROM lineitem""".stripMargin)
    ),
    // anti join: customers with no recent order
    Q(
      "q_anti_join",
      (s, dir) => {
        val recent = Tables.orders(s, dir).where(col("o_orderdate") >= lit("2001-06-01").cast("timestamp"))
        Tables.customer(s, dir)
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2001-06-01')""".stripMargin)
    ),
    // star-schema revenue rollup: both dims broadcast, one fact shuffle
    Q(
      "q_star_revenue",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue")),
      Some("""SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)
    ),
    // skewed join, salted: ~80% of fact rows share one synthetic supplier
    // key; Skew.saltedJoin spreads the hot key over 16 sub-keys and the
    // merge hint forces the shuffle join that skew actually hurts. The
    // oracle is the PLAIN join — salting must be invisible in the result.
    Q(
      "q_skew_join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .withColumn("skew_key",
            when(col("l_orderkey") % 5 > 0, lit(1L)).otherwise(col("l_suppkey")))
        val sup = Tables.supplier(s, dir).select("s_suppkey", "s_name")
        Skew
          .saltedJoin(li, sup.hint("merge"), "skew_key", "s_suppkey",
            saltFrom = Seq(col("l_orderkey"), col("l_linenumber")), salts = 16)
          .groupBy("s_name")
          // exact integer domain: 2-dec price × 2-dec (1-discount) scaled
          // to ×10⁴ longs — the hot group sums ~50k values, where a double
          // sum's fp error can flip the cent rounding between engines
          .agg(round(
            sum(round(col("l_extendedprice") * 100).cast("long") *
              round((lit(1) - col("l_discount")) * 100).cast("long")) / 10000.0, 2)
            .as("revenue"))
      },
      Some("""SELECT s_name,
             |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |          * CAST(round((1 - l_discount) * 100) AS BIGINT)) / 10000.0, 2) AS revenue
             |FROM lineitem
             |JOIN supplier
             |  ON (CASE WHEN l_orderkey % 5 > 0 THEN 1 ELSE l_suppkey END) = s_suppkey
             |GROUP BY s_name""".stripMargin)
    ),
    // Skew diagnostic over the same synthesized hot key q_skew_join joins
    // on: detects the hot key (~80% of rows), reports its share and skew
    // ratio, and recommends the salt count — the planning step before
    // reaching for Skew.saltedJoin.
    Q(
      "q_skew_report",
      (s, dir) => {
        val keyed = Tables.lineitem(s, dir)
          .withColumn("skew_key",
            when(col("l_orderkey") % 5 > 0, lit(1L)).otherwise(col("l_suppkey")))
        Skew.keySkewReport(keyed, "skew_key", k = 5)
      },
      Some("""WITH c AS (SELECT (CASE WHEN l_orderkey % 5 > 0 THEN 1 ELSE l_suppkey END) skew_key,
             |             count(*) cnt
             |           FROM lineitem GROUP BY 1),
             |t AS (SELECT sum(cnt) total, count(*) n_keys FROM c),
             |top AS (SELECT skew_key, cnt FROM c ORDER BY cnt DESC, skew_key LIMIT 5)
             |SELECT skew_key, cnt, round(cnt / total, 4) AS share,
             |  round(cnt / total * n_keys, 4) AS skew_ratio,
             |  CAST(ceil(cnt / total * n_keys) AS BIGINT) AS salt_rec
             |FROM top CROSS JOIN t""".stripMargin)
    ),
    // Fact-fact join over bucketed storage: lineitem and orders are first
    // written bucketed+sorted on the order key (one amortized shuffle),
    // then joined with NO exchange on either side — the 100 TB co-located
    // join. BucketedJoinSpec pins the exchange-free plan; results equal
    // the plain join (the oracle) by construction.
    Q(
      "q_bucket_join",
      (s, dir) => {
        val li = Bucketed.ensureBucketed(s, dir, "lineitem", "l_orderkey", buckets = 8)
        val ord = Bucketed.ensureBucketed(s, dir, "orders", "o_orderkey", buckets = 8)
        s.table(li)
          .join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(
            round(sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0, 2).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT o_orderpriority,
             |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority""".stripMargin)
    ),
    // Bloom semi-join reduction: lineitem is pre-filtered by a Bloom
    // bitset of the urgent order keys BEFORE the join's exchange — at
    // scale the non-matching ~80% of the fact table never shuffles.
    // False positives die in the real join (result-invisible rewrite:
    // the oracle is the plain join); no-FN + prune rate pinned in spec.
    Q(
      "q_bloom_join",
      (s, dir) => {
        val urgent = Tables.orders(s, dir)
          .where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        BloomJoin
          .bloomPrunedJoin(
            Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_extendedprice")),
            urgent, "l_orderkey", "o_orderkey")
          .agg(
            count(lit(1)).as("n_items"),
            round(sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0, 2).as("revenue"))
      },
      Some("""SELECT count(*) AS n_items,
             |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'""".stripMargin)
    ),
    // Range join via bucketized equi-join: per-user quartile windows
    // derived from each series' [min, max] span (all-integer bounds);
    // every event lands back in exactly one window. The oracle is the
    // plain BETWEEN join — the bucket rewrite must be result-invisible.
    Q(
      "q_range_join",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("user_id"), col("ts_ms"))
        val windows = ev.groupBy("user_id")
          .agg(min("ts_ms").as("m"), max("ts_ms").as("mx"))
          .withColumn("w", expr("CAST((mx - m) DIV 4 AS BIGINT)"))
          .withColumn("k", explode(sequence(lit(0L), lit(3L))))
          .select(
            col("user_id"), col("k"),
            (col("m") + col("k") * col("w")).as("w_start"),
            when(col("k") === 3L, col("mx"))
              .otherwise(col("m") + (col("k") + 1L) * col("w") - 1L).as("w_end"))
        RangeJoin
          .intervalJoin(ev, "ts_ms", windows, "w_start", "w_end",
            keyCols = Seq("user_id"), bucketMs = 21600000L)
          .groupBy("user_id", "k", "w_start", "w_end")
          .agg(count(lit(1)).as("n_points"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) ts_ms FROM events),
             |s AS (SELECT user_id, min(ts_ms) m, max(ts_ms) mx FROM e GROUP BY user_id),
             |w AS (SELECT user_id, k, m + k * ((mx - m) // 4) AS w_start,
             |        CASE WHEN k = 3 THEN mx
             |             ELSE m + (k + 1) * ((mx - m) // 4) - 1 END AS w_end
             |      FROM s CROSS JOIN (SELECT unnest(range(0, 4)) k) k),
             |j AS (SELECT e.user_id, w.k, w.w_start, w.w_end
             |      FROM e JOIN w ON e.user_id = w.user_id
             |                   AND e.ts_ms >= w.w_start AND e.ts_ms <= w.w_end)
             |SELECT user_id, CAST(k AS BIGINT) AS k, w_start, w_end, count(*) AS n_points
             |FROM j GROUP BY 1, 2, 3, 4""".stripMargin)
    ),
    // Interval-interval overlap join: sessions segmented by the calendar
    // days they span (a session crossing midnight lands in both days),
    // planned as a bucketized equi-join with the greatest-start bucket
    // filter for exactly-once pairs. The oracle is the plain overlap
    // theta-join — the rewrite must be result-invisible.
    Q(
      "q_overlap_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val sess = graft.ext.Sessionize
          .stats(ev, "user_id", "ts_ms", "event_id", gapMs = 1800000L)
        val days = ev.groupBy("user_id")
          .agg(min("ts_ms").as("m"), max("ts_ms").as("mx"))
          .withColumn("d", explode(sequence(expr("m DIV 86400000"), expr("mx DIV 86400000"))))
          .select(
            col("user_id"), col("d"),
            (col("d") * 86400000L).as("day_start"),
            (col("d") * 86400000L + 86399999L).as("day_end"))
        RangeJoin
          .overlapJoin(sess, "session_start", "session_end",
            days, "day_start", "day_end", Seq("user_id"), bucketMs = 86400000L)
          .select(
            col("user_id"), col("session_seq"), col("d").as("day"),
            (least(col("session_end"), col("day_end")) -
              greatest(col("session_start"), col("day_start"))).as("overlap_ms"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_ms(ts) ts_ms FROM events),
             |l AS (SELECT *, lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) pts FROM e),
             |n AS (SELECT *, CASE WHEN pts IS NULL OR ts_ms - pts > 1800000 THEN 1 ELSE 0 END nw FROM l),
             |s AS (SELECT *, CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
             |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) session_seq FROM n),
             |st AS (SELECT user_id, session_seq,
             |         min(ts_ms) session_start, max(ts_ms) session_end
             |       FROM s GROUP BY 1, 2),
             |b AS (SELECT user_id, min(ts_ms) // 86400000 d0, max(ts_ms) // 86400000 d1
             |      FROM e GROUP BY 1),
             |dd AS (SELECT user_id, unnest(range(d0, d1 + 1)) d FROM b)
             |SELECT st.user_id, st.session_seq, dd.d AS day,
             |  least(st.session_end, dd.d * 86400000 + 86399999)
             |    - greatest(st.session_start, dd.d * 86400000) AS overlap_ms
             |FROM st JOIN dd ON st.user_id = dd.user_id
             |  AND st.session_start <= dd.d * 86400000 + 86399999
             |  AND dd.d * 86400000 <= st.session_end""".stripMargin)
    ),
    // Z-order layout key over orders: customer × order-day interleave,
    // 16 bits each, 256 quad-tree buckets. Coordinates RANGE-QUANTIZE to
    // the grid from the data's own [min, max] span — raw values leave
    // the top interleave bits constant (all rows in one bucket) because
    // neither column fills 16 bits. Sorting files by z_value makes
    // parquet footer stats prune on EITHER column; the oracle replays
    // the identical quantize + shift/mask interleave.
    Q(
      "layout_zorder",
      (s, dir) =>
        Layout.zorder(zorderQuantizedOrders(s, dir), "x", "y", bits = 16, buckets = 256)
          .select(col("o_orderkey"), col("z_value"), col("z_bucket")),
      Some(s"""WITH $zorderQuantCte
             |SELECT o_orderkey, z_value, z_value >> 24 AS z_bucket FROM z""".stripMargin)
    ),
    // The pruning proof for the Z-order layout: per-bucket min/max
    // footer stats on BOTH (quantized) dimensions, plus the would-scan
    // verdict for a fixed single-column probe (quantized customer grid
    // cells 100–200). A linear layout gives every file the full span of
    // the second column; the z-layout bounds both — the
    // scan_for_probe=false rows are the skipped files.
    Q(
      "layout_zorder_stats",
      (s, dir) =>
        Layout.zorder(zorderQuantizedOrders(s, dir), "x", "y", bits = 16, buckets = 256)
          .groupBy("z_bucket")
          .agg(
            min("x").as("x_min"), max("x").as("x_max"),
            min("y").as("y_min"), max("y").as("y_max"),
            count(lit(1)).as("n_rows"))
          .withColumn("scan_for_probe", !(col("x_max") < 100 || col("x_min") > 200)),
      Some(s"""WITH $zorderQuantCte,
             |g AS (SELECT z_value >> 24 AS z_bucket, min(x) x_min, max(x) x_max,
             |        min(y) y_min, max(y) y_max, count(*) n_rows
             |      FROM z GROUP BY 1)
             |SELECT z_bucket, x_min, x_max, y_min, y_max, n_rows,
             |       NOT (x_max < 100 OR x_min > 200) AS scan_for_probe
             |FROM g""".stripMargin)
    ),
    // Three-dimensional Z-order key over lineitem (supplier × part ×
    // quantity, 11 bits each, round-robin interleave). Coordinates are
    // RANGE-QUANTIZED to the grid from the data's own [min, max] span —
    // ((v − min)·2048) DIV (max − min + 1) — so the key is valid at ANY
    // scale factor (raw l_partkey outgrows 11 bits past sf0.01; a raw
    // modulo would wrap and destroy clustering). All-integer, mirrored
    // in the oracle.
    Q(
      "layout_zorder3",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            col("l_suppkey"), col("l_partkey"), col("l_quantity").cast("long").as("l_qty"))
        val bounds = li.agg(
          min("l_suppkey").as("s0"), max("l_suppkey").as("s1"),
          min("l_partkey").as("p0"), max("l_partkey").as("p1"),
          min("l_qty").as("q0"), max("l_qty").as("q1"))
        def quant(v: String, lo: String, hi: String) =
          expr(s"CAST((($v - $lo) * 2048) DIV ($hi - $lo + 1) AS BIGINT)")
        li.crossJoin(broadcast(bounds))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            Layout.zValueN(
              Seq(
                quant("l_suppkey", "s0", "s1"),
                quant("l_partkey", "p0", "p1"),
                quant("l_qty", "q0", "q1")), bits = 11).as("z_value"))
      },
      Some("""WITH b AS (SELECT min(l_suppkey) s0, max(l_suppkey) s1,
             |                  min(l_partkey) p0, max(l_partkey) p1,
             |                  min(CAST(l_quantity AS BIGINT)) q0,
             |                  max(CAST(l_quantity AS BIGINT)) q1 FROM lineitem),
             |q AS (SELECT l_orderkey, l_linenumber,
             |        ((l_suppkey - s0) * 2048) // (s1 - s0 + 1) x,
             |        ((l_partkey - p0) * 2048) // (p1 - p0 + 1) y,
             |        ((CAST(l_quantity AS BIGINT) - q0) * 2048) // (q1 - q0 + 1) z
             |      FROM lineitem CROSS JOIN b)
             |SELECT l_orderkey, l_linenumber,
             |  CAST(list_sum(list_transform(range(0, 11), b ->
             |    (((x >> b) & 1) << (3*b))
             |    + (((y >> b) & 1) << (3*b + 1))
             |    + (((z >> b) & 1) << (3*b + 2)))) AS BIGINT) AS z_value
             |FROM q""".stripMargin)
    ),
    // Exact range-partition bounds: 32 near-equal row-count buckets over
    // o_totalprice — the boundary table a balanced range-partitioned
    // write needs. No global data sort; the cumulative window runs over
    // the distinct-value table only.
    Q(
      "layout_range_bounds",
      (s, dir) => Layout.rangeBounds(Tables.orders(s, dir), "o_totalprice", n = 32),
      Some("""WITH c AS (SELECT o_totalprice v, count(*) cnt FROM orders GROUP BY 1),
             |s AS (SELECT v, cnt, sum(cnt) OVER (ORDER BY v) cum FROM c),
             |s2 AS (SELECT v, cum - cnt + 1 cum_lo, cum FROM s),
             |t AS (SELECT count(*) N FROM orders),
             |b AS (SELECT bucket, (bucket - 1) * N // 32 + 1 r_lo, bucket * N // 32 r_hi
             |      FROM (SELECT unnest(range(1, 33)) bucket) CROSS JOIN t
             |      WHERE bucket * N // 32 >= (bucket - 1) * N // 32 + 1)
             |SELECT bucket, min(v) AS lo, max(v) AS hi,
             |       CAST(min(r_hi - r_lo + 1) AS BIGINT) AS n_rows
             |FROM s2 JOIN b ON cum_lo <= r_hi AND cum >= r_lo
             |GROUP BY bucket""".stripMargin)
    )
  )
}
