package graft

import graft.ext.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** tf·idf keyword extraction and BM25 retrieval semantics: idf zeroes
  * corpus-universal terms, tf scales scores, BM25 length normalization
  * and saturation orderings, deterministic ranks.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("retrieval-spec")
  import spark.implicits._

  test("tfidf: corpus-universal terms score zero; doc-specific terms rank first") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 5)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")) ->
        (r.getAs[String]("wd"), r.getAs[Long]("tf"), r.getAs[Long]("score_fp")))
      .toMap
    // df(a)=2 of N=2 → idf_fp = 0; df(b)=df(c)=1 → idf_fp = 65536 (log2 2 = 1)
    assert(got((1L, 1L)) == (("b", 1L, 65536L)))
    assert(got((1L, 2L)) == (("a", 2L, 0L)))
    assert(got((2L, 1L)) == (("c", 1L, 65536L)))
    assert(got((2L, 2L)) == (("a", 1L, 0L)))
  }

  test("tfidf: k caps per-doc terms, ties break by term ascending") {
    val docs = Seq((1L, "z y x w v u"), (2L, "p")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 3)
      .where($"doc_id" === 1L).orderBy("rank").collect()
    assert(got.length == 3)
    // all six terms tie on score (tf=1, same idf) → lexicographic order
    assert(got.map(_.getAs[String]("wd")).toSeq == Seq("u", "v", "w"))
  }

  private lazy val bmDocs = Seq(
    (1L, "q q x"), // tf=2, dl=3
    (2L, "q x x"), // tf=1, dl=3
    (3L, "q"), // tf=1, dl=1 (shortest)
    (4L, "q x x x x x x x"), // tf=1, dl=8 (longest)
    (5L, "x x x") // no hit — absent from result
  ).toDF("doc_id", "text")

  private lazy val bm = TextAnalysis.bm25TopK(bmDocs, "doc_id", "text", Seq("q"), k = 10)
    .collect()
    .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("rank"), r.getAs[Long]("n_hits"), r.getAs[Long]("score_fp")))
    .toMap

  test("bm25: zero-hit docs are absent; hits count matched terms") {
    assert(!bm.contains(5L))
    assert(bm.values.forall(_._2 == 1L))
  }

  test("bm25: higher tf beats same-length lower tf; shorter doc beats longer at same tf") {
    val score = bm.view.mapValues(_._3)
    assert(score(1L) > score(2L), "tf=2 must outscore tf=1 at the same length")
    assert(score(3L) > score(2L), "dl=1 must outscore dl=3 at the same tf")
    assert(score(2L) > score(4L), "dl=3 must outscore dl=8 at the same tf")
  }

  test("bm25: multi-term scores sum per-term contributions; ranks are dense from 1") {
    val docs = Seq((1L, "q r"), (2L, "q x"), (3L, "r x")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("q", "r"), k = 10)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("rank"), r.getAs[Long]("n_hits")))
      .toMap
    assert(got(1L)._2 == 2L && got(2L)._2 == 1L && got(3L)._2 == 1L)
    assert(got(1L)._1 == 1L, "the two-hit doc must rank first")
    assert(got.values.map(_._1).toSeq.sorted == Seq(1L, 2L, 3L))
  }
}
