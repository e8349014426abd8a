package graft

import graft.ext.{Dedup, Sampling}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Bloom decontamination, duplicated-passage spans, and temperature
  * mixing: containment semantics, span merging arithmetic, √-count
  * quota allocation, isqrt exactness.
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = Sessions.get("corpusops-spec")
  import spark.implicits._

  test("shingleArray: documents shorter than n yield an empty array, not a runtime error") {
    val got = Seq((1L, "one two"), (2L, ""), (3L, "a b c d"))
      .toDF("doc_id", "text")
      .select($"doc_id", org.apache.spark.sql.functions.size(
        Dedup.shingleArray($"text", 3)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 2))
  }

  test("bloomContamination: shared trigrams hit, disjoint vocab does not") {
    // the 2-word probe doc exercises the short-doc path of the Catalyst
    // shingle side (crashed before the shingleArray guard)
    val probe = Seq((1L, "alpha beta gamma delta"), (2L, "xy zz")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "x alpha beta gamma y"), // contains probe trigram "alpha beta gamma"
      (11L, "p q r s t u"), // disjoint vocab
      (12L, "zz") // shorter than n → zero shingles
    ).toDF("doc_id", "text")
    val got = Dedup.bloomContamination(train, probe, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_bloom_hits")))
      .toMap
    assert(got(10L)._1 == 3L && got(10L)._2 >= 1L)
    assert(got(11L) == ((4L, 0L)))
    assert(got(12L) == ((0L, 0L)))
  }

  test("fuzzyDecontamination catches a paraphrase that exact+bloom decontamination miss") {
    // paraphrase: every ~3rd token of the eval item edited — exactly ONE
    // verbatim trigram survives ("lazy dog in"), so exact n-gram
    // decontamination at minShared=2 and the bloom variant both stay
    // silent, while 5 of the probe's 13 bigrams survive (C = 0.3846)
    val probe = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the sunny park today")
    ).toDF("doc_id", "text")
    val train = Seq(
      (100L, "a quick brown wolf jumps over a lazy dog in a sunny park yesterday"), // paraphrased copy
      (101L, "completely unrelated words about spark shuffles and parquet footers")
    ).toDF("doc_id", "text")
    // exact decontamination misses it (1 shared trigram < minShared 2)
    assert(Dedup.contaminationPairs(train, probe, "doc_id", "text", n = 3, minShared = 2L)
      .count() == 0L)
    // bloom variant sees at most the same single verbatim trigram
    val bloomHits = Dedup.bloomContamination(train, probe, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bloom_hits")).toMap
    assert(bloomHits(100L) <= 1L, s"bloom should not clear minShared=2: $bloomHits")
    // fuzzy containment at n=2 flags the paraphrase and only it
    val led = Dedup.fuzzyDecontamination(
      train, probe, "doc_id", "text", n = 2, tau = 0.3, minShingles = 4, maxDf = 100)
      .collect()
      .map(r => r.getAs[Long]("train_id") ->
        (r.getAs[Boolean]("contaminated"), r.getAs[String]("action"),
          Option(r.getAs[java.lang.Long]("best_probe_id")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("max_containment")).map(_.toDouble)))
      .toMap
    assert(led(100L)._1 && led(100L)._2 == "drop" && led(100L)._3.contains(1L),
      s"paraphrase must be dropped: ${led(100L)}")
    assert(led(100L)._4.exists(c => c > 0.38 && c < 0.39), s"C(probe->train)=5/13: ${led(100L)}")
    assert(!led(101L)._1 && led(101L)._2 == "keep" && led(101L)._3.isEmpty,
      s"clean doc must keep: ${led(101L)}")
  }

  test("exciseExactSubstrings: corpus-first occurrence kept, later copies excised at token grain") {
    val common = (1 to 12).map(i => s"c$i").mkString(" ") // 12-token duplicated run, w = 8
    val docs = Seq(
      (1L, s"a1 a2 $common a3"), // lexicographic first occurrence — the owner
      (2L, s"b1 $common b2 b3"), // later copy — excised
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9") // unique, untouched
    ).toDF("doc_id", "text")
    val got = Dedup.exciseExactSubstrings(docs, "doc_id", "text", w = 8)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_tokens_removed"),
          r.getAs[String]("clean_text"))))
      .toMap
    assert(got(1L) == ((0L, 0L, s"a1 a2 $common a3")), s"owner keeps its copy: ${got(1L)}")
    // doc 2's five duplicated 8-windows (pos 1..5) merge to [1, 12]:
    // exactly the 12 copied tokens out, the unique frame kept
    assert(got(2L) == ((1L, 12L, "b1 b2 b3")), s"later copy must excise: ${got(2L)}")
    assert(got(3L) == ((0L, 0L, "x1 x2 x3 x4 x5 x6 x7 x8 x9")))
  }

  test("exciseExactSubstrings: owner tokens are SHIELDED from neighboring duplicates' removal ranges") {
    // doc2 owns "b z" but its flanking "a b"/"b c" windows duplicate
    // doc1's — without the shield their removal ranges would excise the
    // owner's own tokens and "b z" would survive nowhere in the corpus
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a b z b c"),
      (3L, "q b z q")
    ).toDF("doc_id", "text")
    val got = Dedup.exciseExactSubstrings(docs, "doc_id", "text", w = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens_removed"), r.getAs[String]("clean_text"))))
      .toMap
    assert(got(1L) == ((0L, "a b c")), s"doc1 owns its windows: ${got(1L)}")
    assert(got(2L) == ((3L, "b z")), s"owner run survives, flanking dups excised: ${got(2L)}")
    assert(got(3L) == ((2L, "q q")), s"doc3's copy of the owned run excises: ${got(3L)}")
  }

  test("exciseExactSubstringsCascade: a 100-token duplicate is one merged span, not 93 w=8 windows") {
    val run = (1 to 100).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 $run a2"), // corpus-first — kept intact
      (2L, s"b1 $run b2") // later copy — one span, all 100 tokens out
    ).toDF("doc_id", "text")
    val got = Dedup.exciseExactSubstringsCascade(docs, "doc_id", "text", Seq(8, 16, 32, 64))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_tokens_removed"),
          r.getAs[String]("clean_text"))))
      .toMap
    assert(got(1L) == ((0L, 0L, s"a1 $run a2")), s"first copy intact: ${got(1L)}")
    assert(got(2L) == ((1L, 100L, "b1 b2")),
      s"100-token duplicate must report ONE merged span: ${got(2L)}")
  }

  test("exciseExactSubstringsCascade: coarse-grain ownership shields a long duplicate's first copy " +
    "from boilerplate 8-gram ownership elsewhere (the suffix-array fidelity w=8 alone lacks)") {
    // run R = 24 tokens; doc 0 (earliest id) contains only R's first
    // 8-gram (boilerplate), so at w=8 doc 0 owns that hash and doc 1 —
    // the corpus-first copy of the FULL run — has no shield over R's
    // first token: single-grain excision shreds it. The w=16 grain gives
    // doc 1 ownership (R duplicated only between docs 1 and 2), whose
    // shields span the full extent — the first copy survives intact.
    val r = (1 to 24).map(i => s"r$i").mkString(" ")
    val gram = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (0L, s"p1 p2 $gram p3"), // boilerplate owner of R's first 8-gram
      (1L, s"a1 $r a2"), // corpus-first copy of the full 24-token run
      (2L, s"b1 $r b2") // later copy of the run
    ).toDF("doc_id", "text")
    def collectClean(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r0 => r0.getAs[Long]("doc_id") -> r0.getAs[String]("clean_text")).toMap
    // single w=8: doc 1 loses R's first token (owned by doc 0's gram,
    // unshielded) — the divergence the cascade exists to fix
    val single = collectClean(Dedup.exciseExactSubstrings(docs, "doc_id", "text", w = 8))
    assert(single(1L) == s"a1 ${(2 to 24).map(i => s"r$i").mkString(" ")} a2",
      s"w=8 alone shreds the long duplicate's first copy: ${single(1L)}")
    val multi = collectClean(
      Dedup.exciseExactSubstringsCascade(docs, "doc_id", "text", Seq(8, 16, 32, 64)))
    assert(multi(0L) == s"p1 p2 $gram p3", s"gram owner intact: ${multi(0L)}")
    assert(multi(1L) == s"a1 $r a2",
      s"cascade must keep the long duplicate's first copy INTACT: ${multi(1L)}")
    assert(multi(2L) == "b1 b2", s"later copy fully excised: ${multi(2L)}")
  }

  test("duplicatePassages: cross-doc shared passage merges into one span per doc") {
    val common = (1 to 10).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $common a4 a5"),
      (2L, s"b1 $common")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatePassages(docs, "doc_id", "text", w = 8)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("span_start"), r.getAs[Long]("span_end"), r.getAs[Long]("n_windows")))
      .toMap
    // 10 common tokens → 3 duplicated 8-windows; doc1 passage starts at
    // token 3, doc2 at token 1; span covers start..(lastWinStart + 7)
    assert(got(1L) == ((3L, 12L, 3L)))
    assert(got(2L) == ((1L, 10L, 3L)))
  }

  test("duplicatePassages: intra-doc repetition flags both occurrences; clean corpus is empty") {
    val phrase = (1 to 8).map(i => s"w$i").mkString(" ")
    val rep = Seq((1L, s"$phrase x1 x2 $phrase")).toDF("doc_id", "text")
    val spans = Dedup.duplicatePassages(rep, "doc_id", "text", w = 8)
      .orderBy("span_start").collect()
      .map(r => (r.getAs[Long]("span_start"), r.getAs[Long]("span_end"), r.getAs[Long]("n_windows")))
    assert(spans.toSeq == Seq((0L, 7L, 1L), (10L, 17L, 1L)))

    val clean = Seq((1L, "a b c d e f g h i"), (2L, "j k l m n o p q r"))
      .toDF("doc_id", "text")
    assert(Dedup.duplicatePassages(clean, "doc_id", "text", w = 8).count() == 0L)
  }

  test("chunk: short docs yield one chunk; long docs get full-size windows with a flushed tail") {
    import graft.ext.TextAnalysis
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 ≤ 24 → one chunk
      (2L, (1 to 54).map(i => s"u$i").mkString(" ")) // 54 → starts 0, 16, 30
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, "doc_id", "text", size = 24, overlap = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) ->
        (r.getAs[Long]("start_tok"), r.getAs[Long]("n_toks")))
      .toMap
    assert(got((1L, 0L)) == ((0L, 10L)))
    assert(got((2L, 0L)) == ((0L, 24L)))
    assert(got((2L, 1L)) == ((16L, 24L)))
    assert(got((2L, 2L)) == ((30L, 24L)), "final chunk flushes against the end, stays full-size")
    assert(got.size == 4)
  }

  test("chunk invariants, exhaustive over doc lengths 1..200: full coverage, bounded overlap, full-size windows") {
    import graft.ext.TextAnalysis
    val size = 24
    val overlap = 8
    val stride = size - overlap
    val docs = (1 to 200).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.chunk(docs, "doc_id", "text", size, overlap)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_tok"), r.getAs[Long]("n_toks")))
      .groupBy(_._1)
    (1 to 200).foreach { n =>
      val cs = chunks(n.toLong).map(c => (c._2, c._3)).sortBy(_._1)
      // every token covered, no gap between consecutive chunks
      assert(cs.head._1 == 0L && cs.last._1 + cs.last._2 == n.toLong, s"n=$n endpoints")
      cs.sliding(2).foreach {
        case Array((s1, len1), (s2, _)) =>
          assert(s2 <= s1 + len1, s"n=$n gap between chunks at $s1 and $s2")
          assert(s2 - s1 <= stride, s"n=$n stride exceeded")
        case _ => ()
      }
      // all windows full-size once the doc exceeds one window
      if (n > size) assert(cs.forall(_._2 == size.toLong), s"n=$n ragged chunk")
      else assert(cs.toSeq == Seq((0L, n.toLong)))
    }
  }

  test("chunk: exact-multiple lengths do not emit a duplicate final window") {
    import graft.ext.TextAnalysis
    // n = 40, size 24, stride 16: mid starts {0}, final = 16 — distinct
    val docs = Seq((1L, (1 to 40).map(i => s"v$i").mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, "doc_id", "text", size = 24, overlap = 8)
      .collect().map(r => r.getAs[Long]("start_tok")).sorted.toSeq
    assert(got == Seq(0L, 16L))
  }

  test("incremental clusters: star-edge fold-in equals full recompute; delta merges base clusters") {
    import spark.implicits._
    import graft.ext.Dedup
    val basePairs = Seq((10L, 11L), (12L, 13L)).toDF("da", "db") // {10,11} and {12,13}
    val deltaPairs = Seq(
      (11L, 12L), // merges the two base clusters
      (1L, 13L), // new node with a NEW global min id
      (20L, 21L)) // entirely fresh cluster
      .toDF("da", "db")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("canonical_id"), r.getAs[Long]("cluster_size")))
      .toMap
    val incr = toMap(Dedup.incrementalClusters(Dedup.clusters(basePairs), deltaPairs))
    val full = toMap(Dedup.clusters(basePairs.unionByName(deltaPairs)))
    assert(incr == full, "star-edge fold-in must reproduce the full recompute exactly")
    assert(incr(10L) == ((1L, 5L)), "merged component re-canonicalizes to the new global min")
    assert(incr(20L) == ((20L, 2L)))
  }

  test("incrementalPairs: delta re-crawls hit their base twin; novel docs pass clean") {
    val base = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "completely different content about spark shuffles and partitions here")
    ).toDF("doc_id", "text")
    val delta = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"), // exact re-crawl of 100
      (2L, "totally novel text with its own words nothing shared at all")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalPairs(base, delta, "doc_id", "text", tau = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("delta_id"), r.getAs[Long]("base_id"), r.getAs[Double]("jaccard")))
    assert(got.toSeq == Seq((1L, 100L, 1.0)))
  }

  test("incrementalPairs matches the symmetric pair finder restricted to cross-side pairs") {
    // same corpus split two ways: whole-corpus pairs filtered to
    // (delta, base) sides must equal the incremental screen (same tau,
    // same banding) when no bucket hits the cap
    val docs = (1 to 30).map { i =>
      val core = "alpha beta gamma delta epsilon zeta eta theta"
      if (i % 3 == 0) (i.toLong, s"$core v$i") else (i.toLong, s"unique$i words$i only$i here$i now$i then$i x$i y$i")
    }.toDF("doc_id", "text")
    val base = docs.where($"doc_id" % 2 === 0)
    val delta = docs.where($"doc_id" % 2 === 1)
    val inc = Dedup.incrementalPairs(base, delta, "doc_id", "text", tau = 0.3)
      .collect().map(r => (r.getAs[Long]("delta_id"), r.getAs[Long]("base_id"))).toSet
    val all = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, perms = 16, bands = 4, tau = 0.3)
      .collect().flatMap { r =>
        val (a, b) = (r.getAs[Long]("da"), r.getAs[Long]("db"))
        Seq(a -> b, b -> a)
      }
      .filter { case (d, bs) => d % 2 == 1 && bs % 2 == 0 }
      .toSet
    assert(inc == all)
  }

  test("isqrt is exact at squares, neighbors, and large values") {
    val xs = Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, 17L, 99L, 100L,
      999999999999L, 1000000000000L, (1L << 40) - 1, 1L << 40,
      // top of the Long domain: the (s0+1)² probe must not overflow
      9223372030926249000L, 9223372030926249001L, Long.MaxValue)
    val got = xs.toDF("x").select(Sampling.isqrt(col("x")).as("s"))
      .collect().map(_.getLong(0))
    // ground truth: largest s with s² ≤ x, in overflow-safe BigInt
    def isqrtExact(x: Long): Long =
      Iterator.iterate(math.sqrt(x.toDouble).toLong + 2)(_ - 1)
        .find(s => BigInt(s) * BigInt(s) <= BigInt(x)).get
    val exact = xs.map(isqrtExact)
    assert(got.toSeq == exact)
  }

  test("collocations: bound pairs score positive PMI, anti-correlated pairs negative") {
    import graft.ext.TextAnalysis
    // "new york" always adjacent (perfect collocation); "a b" occur often
    // but never adjacent to each other after the first tokens
    val docs = (1 to 10).map(i => (i.toLong,
      "new york " + Seq.fill(5)("a x b y").mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, "doc_id", "text", minCount = 5L, k = 50)
      .collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r.getAs[Long]("pmi_fp"))
      .toMap
    assert(got(("new", "york")) > 0L, "perfect collocation must have positive PMI")
    assert(got(("a", "x")) > 0L)
    // "y a" happens (between repetitions) but "a" is also followed by x
    // constantly — the ubiquitous-token pair ranks below the bound pair
    assert(got(("new", "york")) > got(("y", "a")))
  }

  test("drift: appearing tokens score positive, vanishing negative, stable near zero") {
    import graft.ext.TextAnalysis
    val oldDf = Seq((1L, "stable stable gone gone gone")).toDF("doc_id", "text")
    val newDf = Seq((2L, "stable stable fresh fresh fresh")).toDF("doc_id", "text")
    val got = TextAnalysis.drift(oldDf, newDf, "doc_id", "text", k = 10)
      .collect()
      .map(r => r.getAs[String]("wd") -> r.getAs[Long]("d_fp"))
      .toMap
    assert(got("fresh") > 0L, "appearing token must have positive log-ratio")
    assert(got("gone") < 0L, "vanishing token must have negative log-ratio")
    assert(got("stable") == 0L, "identical counts and totals → exactly zero")
    // moved-mass ranking puts the appearing token first (same |d| as the
    // vanishing one, but weighted by the NEW snapshot count)
    val ranks = TextAnalysis.drift(oldDf, newDf, "doc_id", "text", k = 10)
      .collect().map(r => r.getAs[String]("wd") -> r.getAs[Long]("rank")).toMap
    assert(ranks("fresh") < ranks("gone"))
  }

  test("robustNorm: outliers cannot move the median/MAD; zero-MAD guarded") {
    import graft.ext.TextAnalysis
    val df = Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L), (4L, "a", 100L), // outlier
      (5L, "b", 7L), (6L, "b", 7L), (7L, "b", 7L) // zero spread
    ).toDF("doc_id", "source", "n_chars")
    val got = TextAnalysis.robustNorm(df, "doc_id", "source", "n_chars")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("med"), r.getAs[Long]("mad"), r.getAs[Long]("z_pts")))
      .toMap
    // group a: lower median = 2, devs [1,0,1,98] → mad = 1
    assert(got(1L) == ((2L, 1L, -10000L)))
    assert(got(2L) == ((2L, 1L, 0L)))
    assert(got(3L) == ((2L, 1L, 10000L)))
    assert(got(4L) == ((2L, 1L, 980000L)), "the outlier is scored, not absorbed")
    // group b: all equal → mad 0, guarded divide → z 0
    assert(got(5L) == ((7L, 0L, 0L)) && got(6L) == ((7L, 0L, 0L)) && got(7L) == ((7L, 0L, 0L)))
  }

  test("sampleWeighted: dominant weights win, cap holds, deterministic under repartitioning") {
    val rows = (1 to 400).map(i => (i.toLong, if (i <= 4) 1000000L else 1L))
    val df = rows.toDF("doc_id", "w")
    val a = Sampling.sampleWeighted(df.repartition(7), "doc_id", "w", n = 50, salt = "s")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val b = Sampling.sampleWeighted(df.repartition(3), "doc_id", "w", n = 50, salt = "s")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(a == b, "picks must be a pure function of (salt, ids, weights)")
    assert(a.size == 50)
    // a weight 10^6 times larger has priority u/w ~10^6 smaller — the
    // four heavy rows are effectively guaranteed in a 50-of-400 sample
    assert(Set(1L, 2L, 3L, 4L).subsetOf(a))
  }

  test("sampleWeighted raises on null or non-positive weights instead of mis-ranking") {
    val df = Seq((1L, 5L), (2L, 0L)).toDF("doc_id", "w")
    val ex = intercept[Exception] {
      Sampling.sampleWeighted(df, "doc_id", "w", n = 2, salt = "s").collect()
    }
    assert(ex.getMessage.contains("positive non-null"))
  }

  test("mixTemperature: quotas proportional to sqrt(count), small sources upweighted") {
    val rows = (1 to 100).map(i => (i.toLong, "big")) ++ (101 to 125).map(i => (i.toLong, "small"))
    val df = rows.toDF("doc_id", "source")
    val got = Sampling.mixTemperature(df, "doc_id", "source", targetTotal = 15L, salt = "t")
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    // w = √100=10, √25=5; sw=15 → quotas 10 and 5 (proportional would be 12/3)
    assert(got == Map("big" -> 10L, "small" -> 5L))
  }

  test("mixTemperature: quota above group size keeps the whole group; deterministic") {
    val rows = (1 to 4).map(i => (i.toLong, "tiny")) ++ (5 to 104).map(i => (i.toLong, "big"))
    val df = rows.toDF("doc_id", "source")
    val a = Sampling.mixTemperature(df.repartition(7), "doc_id", "source", 120L, "t")
    val b = Sampling.mixTemperature(df.repartition(2), "doc_id", "source", 120L, "t")
    val ga = a.orderBy("doc_id").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(ga == b.orderBy("doc_id").collect().map(_.getAs[Long]("doc_id")).toSeq)
    // w = 2 and 10, sw = 12 → quotas 20 (> 4 → keep all) and 100
    val counts = a.groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    assert(counts == Map("tiny" -> 4L, "big" -> 100L))
  }

  test("qualityLr: weights bounded, score is the order-invariant mean, repetition leaves it fixed") {
    import graft.ext.TextAnalysis
    val w = TextAnalysis.qualityLrWeights(spark, 4096).collect()
    assert(w.length == 4096)
    assert(w.forall(r => math.abs(r.getAs[Long]("w_milli")) <= 1000))

    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "epsilon delta gamma beta alpha"), // same bag, different order
      (3L, "alpha beta gamma delta epsilon alpha beta gamma delta epsilon") // doc 1 twice
    ).toDF("doc_id", "text")
    val got = TextAnalysis.qualityLr(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("score"), r.getAs[Boolean]("keep")))).toMap
    assert(got(1L)._2 == got(2L)._2, "bag-of-words: token order cannot move the score")
    assert(got(1L)._3 == got(2L)._3)
    assert(got(3L)._1 == 2 * got(1L)._1)
    assert(got(3L)._2 == got(1L)._2, "exact repetition keeps the mean weight fixed")
  }

  test("qualityLr: keep is the sign of the integer weight sum, never of the floored mean") {
    import graft.ext.TextAnalysis
    // recompute the integer sum per doc from the weight table and check
    // keep thresholds on it (score floors toward -inf, so a tiny positive
    // mean can surface as 0.0 while keep stays true)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val weights = TextAnalysis.qualityLrWeights(spark, 4096)
    val toks = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.explode(TextAnalysis.words(col("text"))).as("tok"))
    val sums = toks
      .withColumn("bucket", graft.ext.Sketches.hash60(col("tok")) % 4096)
      .join(weights, "bucket")
      .groupBy("doc_id").agg(org.apache.spark.sql.functions.sum("w_milli").as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("s")).toMap
    val got = TextAnalysis.qualityLr(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(got.nonEmpty && got.forall { case (id, keep) => keep == (sums(id) > 0) })
  }
}
