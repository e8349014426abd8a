package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for shuffle joins — the classic salting
  * rewrite. AQE's skew-join splitting handles a skewed SORT-MERGE join at
  * runtime, but only that: it cannot help when the join's output must stay
  * co-partitioned for a downstream stage, when the skew is in a grouping
  * key, or when the planner picked a shuffled hash join. Salting is the
  * plan-level fix: spread each hot fact key over `salts` synthetic
  * sub-keys and replicate the (small, but not broadcast-small) build side
  * once per sub-key, so the hot key's rows land on `salts` different
  * reducers instead of one.
  *
  * Join semantics are preserved exactly: a fact row matches precisely the
  * one build-side replica carrying its salt, so the salted join's result
  * equals the plain join's (the driver oracle for `q_skew_join` is the
  * PLAIN SQL join — salting must be invisible in results).
  *
  * The salt is a deterministic hash of caller-chosen columns (NOT rand()):
  * retries, re-runs, and AQE re-plans all see the same salt for the same
  * row. Pick salt columns that vary within the hot key (a line number, a
  * timestamp) or load is not actually spread.
  *
  * Scale: build-side replication costs |dim| × salts rows — choose salts
  * ≈ (hot-key rows / target-partition rows), typically 8–64 at 100 TB.
  * Fact side cost is one extra narrow column.
  */
object Skew {

  /** Inner equi-join `fact.keyCol = dim.dimKeyCol` with the fact side
    * salted by `hash(saltFrom) mod salts` and the dim side replicated per
    * salt value. Output schema matches the plain join's: all fact columns
    * plus all dim columns (when the two key columns share a name the
    * merged value appears once, like `join(_, Seq(key))`). Column names
    * `_fsalt`, `_dsalt`, `_dimkey` are reserved for the rewrite — inputs
    * must not use them.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keyCol: String,
      dimKeyCol: String,
      saltFrom: Seq[Column],
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val reserved = Seq("_fsalt", "_dsalt", "_dimkey")
    require(
      (fact.columns ++ dim.columns).intersect(reserved).isEmpty,
      s"saltedJoin reserves column names ${reserved.mkString(", ")}")
    val salted = fact.withColumn("_fsalt", pmod(hash(saltFrom: _*), lit(salts)))
    val replicated = dim
      .withColumn("_dsalt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumnRenamed(dimKeyCol, "_dimkey")
    val joined = salted
      .join(replicated, col(keyCol) === col("_dimkey") && col("_fsalt") === col("_dsalt"))
    // restore the dim key under its own name (the plain join keeps it)
    val restored =
      if (dimKeyCol == keyCol) joined
      else joined.withColumn(dimKeyCol, col("_dimkey"))
    restored.drop("_fsalt", "_dsalt", "_dimkey")
  }

  /** Join-key skew diagnostic — the planning step that decides whether
    * `saltedJoin` is needed and with how many salts. One partial-aggregated
    * groupBy builds the key-frequency table; the top-k hot keys surface via
    * orderBy().limit(k) (TakeOrderedAndProject — no global sort, no
    * single-partition window) and the one-row total is broadcast back. Per
    * hot key: `share` of all rows, `skew_ratio` = its count over the mean
    * rows-per-key (1.0 = perfectly uniform), and `salt_rec` =
    * ⌈skew_ratio⌉ — the salt count that spreads the hot key's rows back to
    * roughly mean-partition size, the sizing rule documented on
    * `saltedJoin`.
    */
  def keySkewReport(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("total"), count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("cnt").desc, col(keyCol)).limit(k)
    top
      .crossJoin(broadcast(totals))
      .select(
        col(keyCol), col("cnt"),
        round(col("cnt") / col("total"), 4).as("share"),
        round(col("cnt") / col("total") * col("n_keys"), 4).as("skew_ratio"),
        ceil(col("cnt") / col("total") * col("n_keys")).cast("long").as("salt_rec"))
  }
}
