package graft

import graft.ext.Packing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("packing-spec")
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def pack(rows: Seq[(Long, String, Long)], cap: Long) =
    Packing
      .packGreedy(rows.toDF("doc_id", "source", "n_tokens"), "doc_id", "source", "n_tokens", cap)
      .collect()
      .map(r =>
        (r.getAs[Long]("doc_id"),
          (r.getAs[Long]("seq_idx"), r.getAs[Long]("seq_pos"), r.getAs[Long]("seq_off"),
            r.getAs[Boolean]("oversize"))))
      .toMap

  test("next-fit semantics: close the open sequence when the next doc no longer fits") {
    // capacity 10: [4, 5] fill bin 0 (fill 9); 2 doesn't fit -> bin 1;
    // 8 fits alongside it (2+8=10); 9 forces bin 2
    val out = pack(
      Seq((1L, "s", 4L), (2L, "s", 5L), (3L, "s", 2L), (4L, "s", 8L), (5L, "s", 9L)), cap = 10L)
    assert(out(1L) == ((0L, 0L, 0L, false)))
    assert(out(2L) == ((0L, 1L, 4L, false)))
    assert(out(3L) == ((1L, 0L, 0L, false)))
    assert(out(4L) == ((1L, 1L, 2L, false)))
    assert(out(5L) == ((2L, 0L, 0L, false)))
  }

  test("oversize docs occupy a sequence alone and are flagged") {
    val out = pack(Seq((1L, "s", 3L), (2L, "s", 99L), (3L, "s", 3L)), cap = 10L)
    assert(out(2L) == ((1L, 0L, 0L, true)))
    // the doc after an oversize one starts a fresh sequence
    assert(out(3L) == ((2L, 0L, 0L, false)))
  }

  test("groups pack independently; capacity is never exceeded by a multi-doc sequence") {
    val docs = Tables.documents(spark, sf)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val out = Packing.packGreedy(docs, "doc_id", "source", "n_tokens", capacity = 256L)
    val fills = out.groupBy("source", "seq_idx")
      .agg(sum("n_tokens").as("fill"), count("*").as("n"), max("oversize").as("ov"))
      .collect()
    assert(fills.nonEmpty)
    fills.foreach { r =>
      val multi = r.getAs[Long]("n") > 1
      if (multi) assert(r.getAs[Long]("fill") <= 256L, s"overfull multi-doc sequence: $r")
    }
    // determinism: same input packs identically across runs
    val again = Packing.packGreedy(docs, "doc_id", "source", "n_tokens", capacity = 256L)
    assert(out.orderBy("doc_id").collect().sameElements(again.orderBy("doc_id").collect()))
    // seq_off is always the running sum of earlier docs in the sequence
    val offOk = out
      .withColumn("expected_off",
        sum("n_tokens").over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("source", "seq_idx").orderBy("seq_pos")
            .rowsBetween(Long.MinValue, -1)))
      .where(col("seq_pos") > 0 && col("seq_off") =!= col("expected_off"))
    assert(offOk.count() == 0L)
  }
}
