package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the biggest shuffle saver for a
  * selective fact-dim join at 100 TB: when only a small fraction of fact
  * rows survive the join, shipping the rest through the exchange is pure
  * waste. A Bloom bitset of the dim-side keys filters the fact side
  * BEFORE its shuffle; false positives are harmless (the real join drops
  * them — the rewrite is result-invisible), false negatives cannot happen
  * (every inserted key tests positive), so correctness never depends on
  * the filter. Spark's runtime row-level bloom does this adaptively; this
  * operator is the explicit, tunable form for when the planner's
  * heuristics pass (tiny dim below the threshold, or a pre-computed
  * key set reused across many queries).
  *
  * Layout: k seeded xxhash64 values (Spark's native codegen'd hash —
  * unlike the oracle-replayable md5 paths, the Bloom never needs
  * cross-engine replay because the REWRITE is what's checked, not the
  * hash) → k bit positions in an mBits bitset. The bitset is built by
  * per-word `bit_or` AGGREGATION, so the driver collect is the word
  * table itself — mBits/64 longs, independent of dim cardinality — and
  * the probe is a pure codegen'd expression over a literal array (no
  * UDF, no extra join, no broadcast variable plumbing).
  */
object BloomJoin {

  /** k bit positions of a key: xxhash64 seeded by the probe index. */
  private def positions(key: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map(j => pmod(xxhash64(lit(j), key), lit(mBits.toLong)))

  /** Build the bitset words from the dim-side key column. The aggregation
    * keeps the collect at mBits/64 longs (the bitset's own size) no
    * matter how many keys go in.
    */
  def bitsetWords(dimKeys: DataFrame, keyCol: String, mBits: Int, k: Int): Array[Long] = {
    require(k >= 1 && k <= 8, s"k out of sane range [1,8]: $k")
    require(mBits >= 64 && mBits <= (1 << 24), s"mBits out of sane range: $mBits")
    val words = dimKeys
      .select(explode(array(positions(col(keyCol), mBits, k): _*)).as("pos"))
      .groupBy(expr("CAST(pos DIV 64 AS INT)").as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))").as("bits"))
      .collect()
    val bits = new Array[Long]((mBits + 63) / 64)
    words.foreach(r => bits(r.getAs[Int]("w")) = r.getAs[Long]("bits"))
    bits
  }

  /** Filter `fact` to rows whose key MIGHT be in the bitset (all k bits
    * set). Pure expression — it sits under the fact scan's filter, ahead
    * of any exchange, and whole-stage codegen fuses it with the scan.
    */
  def prune(fact: DataFrame, keyCol: String, bits: Array[Long], mBits: Int, k: Int): DataFrame = {
    val bitsLit = typedLit(bits.toSeq)
    val cond = positions(col(keyCol), mBits, k)
      .map { p =>
        element_at(bitsLit, call_function("shiftright", p, lit(6)).cast("int") + 1)
          .bitwiseAND(call_function("shiftleft", lit(1L), (p % 64).cast("int"))) =!= 0L
      }
      .reduce(_ && _)
    fact.where(cond)
  }

  /** The fused form: prune `fact` by the Bloom of `dim`'s keys, then run
    * the real equi-join. Result-identical to the plain join by
    * construction; the win is every non-matching fact row that never
    * reaches the join's exchange.
    */
  def bloomPrunedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      mBits: Int = 1 << 17,
      k: Int = 3): DataFrame = {
    val bits = bitsetWords(dim.select(col(dimKey)).distinct(), dimKey, mBits, k)
    prune(fact, factKey, bits, mBits, k).join(dim, col(factKey) === col(dimKey))
  }
}
