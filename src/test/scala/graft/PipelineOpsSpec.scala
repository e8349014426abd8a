package graft

import graft.ext.{Compaction, Integrity, Merge, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Table-maintenance and corpus-pipeline operators added in round 6:
  * changelog MERGE, compaction planning, shard shuffle, int8 ANN,
  * inverted index.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("pipeline-ops-spec")
  import spark.implicits._

  test("merge: latest seq wins, deletes drop keys, untouched rows pass through") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "v", "n")
    val delta = Seq(
      (1L, "a2", 11L, 0L, "upsert"),
      (1L, "a3", 12L, 2L, "upsert"), // later seq outranks
      (2L, "b", 20L, 0L, "delete"),
      (4L, "d", 40L, 1L, "upsert") // brand-new key
    ).toDF("k", "v", "n", "seq", "op")
    val out = Merge.applyChangelog(base, delta, "k", "seq", "op")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map(1L -> ("a3", 12L), 3L -> ("c", 30L), 4L -> ("d", 40L)))
  }

  test("merge: delete then re-upsert at a higher seq resurrects the key") {
    val base = Seq((1L, "x")).toDF("k", "v")
    val delta = Seq((1L, "x", 0L, "delete"), (1L, "y", 1L, "upsert")).toDF("k", "v", "seq", "op")
    val out = Merge.applyChangelog(base, delta, "k", "seq", "op").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "y")))
  }

  test("compaction: first-fit bins never split a file and respect file order") {
    val files = Seq(
      ("p", 1L, 40L), ("p", 2L, 40L), ("p", 3L, 40L), // all admit: pre-file cum < 100
      ("p", 4L, 250L), // oversized: starts past the boundary, alone in bin 1
      ("p", 5L, 10L),
      ("q", 1L, 10L) // other partition independent
    ).toDF("part", "file_id", "bytes")
    val out = Compaction.plan(files, "part", "file_id", "bytes", targetBytes = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("bin")).toMap
    assert(out(("p", 1L)) == 0L && out(("p", 2L)) == 0L)
    assert(out(("p", 3L)) == 0L) // starts at cum 80 < 100 — first-fit admits it
    assert(out(("p", 4L)) == 1L) // starts at cum 120 — new bin, alone
    assert(out(("p", 5L)) == 3L) // after the oversized file the boundary advanced past it
    assert(out(("q", 1L)) == 0L)
  }

  test("compaction stats: rollup flags multi-file bins for rewrite") {
    val files = Seq(("p", 1L, 60L), ("p", 2L, 60L), ("p", 3L, 300L)).toDF("part", "file_id", "bytes")
    val planned = Compaction.plan(files, "part", "file_id", "bytes", targetBytes = 100L)
    val st = Compaction.stats(planned, "part", targetBytes = 100L)
      .collect().map(r => r.getAs[Long]("bin") -> (r.getAs[Long]("n_files"), r.getAs[Boolean]("needs_rewrite"))).toMap
    assert(st(0L) == (2L, true)) // two 40s packed together
    assert(st.values.count(!_._2) == 1) // the lone oversized file needs no rewrite
  }

  test("shard shuffle: total permutation — shards partition rows, pos is 1..n per shard, stable") {
    val df = (1L to 200L).toDF("id")
    val out = Sampling.shardShuffle(df, "id", nShards = 4, salt = "s1")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(out.length == 200 && out.map(_._1).toSet.size == 200)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, "pos must be dense 1..n")
    }
    val again = Sampling.shardShuffle(df, "id", nShards = 4, salt = "s1")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq, "same salt → same permutation")
    val other = Sampling.shardShuffle(df, "id", nShards = 4, salt = "s2")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(out.sortBy(_._1).toSeq != other.sortBy(_._1).toSeq, "salt change reshuffles")
  }

  test("int8 quantization: codes bounded by ±127, max-|component| hits ±127, zero vector safe") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val rows = Similarity.int8Quantize(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getAs[Seq[Int]]("code")).toMap
    assert(rows(1L).max <= 127 && rows(1L).min >= -127)
    assert(rows(1L)(1) == -127, "the max-magnitude component must saturate")
    assert(rows(1L)(0) == 64, "0.5/1.0 · 127 rounds half-up to 64")
    assert(rows(2L).forall(_ == 0), "zero vector → zero codes")
  }

  test("int8 top-k recall vs float cosine top-k is high on the embeddings table") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", col("id") < 10, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val codes = Similarity.int8Quantize(emb, "vec_id", "embedding")
    val got = Similarity.int8TopK(codes, col("id") < 10, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall@5 $recall")
  }

  test("budget cap: fills per group in quality order, keeps the crossing doc, cuts the rest") {
    val docs = Seq(
      // (id, group, quality, tokens)
      (1L, "a", 9L, 60L), // kept: cum_before 0
      (2L, "a", 8L, 50L), // kept: cum_before 60 < 100 (crosses to 110)
      (3L, "a", 7L, 10L), // cut: cum_before 110 >= 100
      (4L, "b", 1L, 500L), // kept: every group's first doc always admits
      (5L, "b", 0L, 1L) // cut
    ).toDF("id", "grp", "q", "tokens")
    val kept = Sampling.budgetCap(docs, "id", "grp", "q", "tokens", budgetTokens = 100L)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L))
  }

  test("budget cap: quality ties break by id — deterministic under reordering") {
    val docs = Seq((2L, "a", 5L, 80L), (1L, "a", 5L, 80L), (3L, "a", 5L, 80L)).toDF("id", "grp", "q", "tokens")
    val kept = Sampling.budgetCap(docs, "id", "grp", "q", "tokens", budgetTokens = 100L)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), "ids 1 (cum 80) and 2 (crossing) keep; 3 cut")
  }

  test("referential report: null, orphan, and dup-pk counts on a known fixture") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None, Some(9L)).toDF("fk")
    val parent = Seq(1L, 2L, 3L, 3L).toDF("pk")
    val out = Integrity.referentialReport(child, "fk", parent, "pk")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("null_fk" -> 1L, "orphan_fk" -> 2L, "dup_pk" -> 2L))
  }

  test("fd violations: determinants mapping to >1 dependent value, with row mass") {
    val rows = Seq(
      ("s1", "en"), ("s1", "en"), ("s1", "de"), // s1 → {en, de}: violation, 3 rows
      ("s2", "fr"), ("s2", "fr"), // s2 holds the FD
      (null.asInstanceOf[String], "en")) // null determinant never reported
      .toDF("src", "lng")
    val out = Integrity.fdViolations(rows, "src", "lng")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("s1" -> ((2L, 3L))))
  }

  test("snapshot diff: classifies added/removed/changed with the differing column list") {
    val before = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "v", "n")
    val after = Seq((1L, "a", 10L), (2L, "B", 21L), (4L, "d", 40L)).toDF("k", "v", "n")
    val out = Integrity.snapshotDiff(before, after, "k", Seq("v", "n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out == Map(
      2L -> ("changed", "v,n"),
      3L -> ("removed", ""),
      4L -> ("added", "")))
    val withSame = Integrity.snapshotDiff(before, after, "k", Seq("v", "n"), includeUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(withSame(1L) == "unchanged")
  }

  test("snapshot diff of a changelog apply reproduces exactly the changelog's effect") {
    val base = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("k", "v")
    val delta = Seq((2L, "y", 0L, "upsert"), (3L, "x", 0L, "delete"), (4L, "z", 0L, "upsert"))
      .toDF("k", "v", "seq", "op")
    val merged = Merge.applyChangelog(base, delta, "k", "seq", "op")
    val diff = Integrity.snapshotDiff(base, merged, "k", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("inverted index: tf, df, ordered positions on known docs; minDf prunes") {
    val docs = Seq(
      (1L, "b a b"),
      (2L, "a c"),
      (3L, "a")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, "doc_id", "text", minDf = 1)
      .collect().map(r => (r.getString(0), r.getLong(2)) -> (r.getLong(1), r.getLong(3), r.getString(4))).toMap
    assert(out(("a", 1L)) == (3L, 1L, "1"))
    assert(out(("b", 1L)) == (1L, 2L, "0,2"))
    assert(out(("a", 2L)) == (3L, 1L, "0"))
    assert(out(("c", 2L)) == (1L, 1L, "1"))
    val pruned = TextAnalysis.invertedIndex(docs, "doc_id", "text", minDf = 2)
      .select("token").distinct().collect().map(_.getString(0)).toSet
    assert(pruned == Set("a"), "minDf=2 must keep only the cross-doc token")
  }
}
