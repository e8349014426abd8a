package graft

import org.apache.spark.sql.SparkSession
import graft.ext.Dedup

/** Scale probe for the shuffle-heavy dedup path: runs the MinHash-LSH
  * candidate funnel (with counts, not just wall time) and the
  * label-propagation cluster assembly (with round counts) on a given
  * fixture dir — the measurements BENCH_NOTES' 100x tables are built
  * from. Usage: runMain graft.ScaleProbe <sfDir> [tau] [maxBucket].
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val semanticMode = args.length > 1 && args(1) == "semantic"
    val ppjoinMode = args.length > 1 && args(1) == "ppjoin"
    val videoMode = args.length > 1 && args(1) == "video"
    val videoLshMode = args.length > 1 && args(1) == "videolsh"
    val audioMode = args.length > 1 && args(1) == "audio"
    val lshIdxMode = args.length > 1 && args(1) == "lshidx"
    val splitSafeMode = args.length > 1 && args(1) == "splitsafe"
    val graphMode = args.length > 1 && args(1) == "graph"
    val containMode = args.length > 1 && args(1) == "contain"
    val exciseMode = args.length > 1 && args(1) == "excise"
    val phashMode = args.length > 1 && args(1) == "phash"
    val warcMode = args.length > 1 && args(1) == "warc"
    val ledgerMode = args.length > 1 && args(1) == "ledger"
    val asofMode = args.length > 1 && args(1) == "asof"
    val detectMode = args.length > 1 && args(1) == "detect"
    val tsopsMode = args.length > 1 && args(1) == "tsops"
    val corrMode = args.length > 1 && args(1) == "corr"
    val namedMode = semanticMode || ppjoinMode || videoMode || videoLshMode || audioMode ||
      lshIdxMode || splitSafeMode || exciseMode || phashMode || warcMode || ledgerMode ||
      asofMode || detectMode || tsopsMode || graphMode || containMode || corrMode
    val tau = if (!namedMode && args.length > 1) args(1).toDouble else 0.5
    // 0 = occupancy-aware auto cap (maxBucketFor), the production default
    val maxBucket = if (!namedMode && args.length > 2) args(2).toInt else 0
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scaleprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // corr mode: runMain graft.ScaleProbe <sfDir> corr [kSmall] [mult] [buckets]
    // — the pairwiseCorr-vs-topCorrelatedPairs scale evidence: exact
    // all-pairs at K series (guarded), the pruned sign-sketch funnel at
    // K and mult·K. Synthetic cohort series (8 phase cohorts + hash
    // noise) so real correlated pairs exist at every K; sub-quadratic =
    // the 10x-series wall grows far below 100x.
    if (corrMode) {
      import org.apache.spark.sql.functions._
      val kSmall = if (args.length > 2) args(2).toInt else 500
      val mult = if (args.length > 3) args(3).toInt else 10
      val bkts = if (args.length > 4) args(4).toInt else 360
      def series(k: Int) = spark.range(k.toLong * bkts)
        .select(
          (col("id") % k).as("k"),
          (expr(s"id DIV $k") * 3600000L).as("t"),
          (sin(expr(s"id DIV $k") * 0.26 + (col("id") % k % 8).cast("double") * 0.785398) * 10.0 +
            pmod(hash(col("id")), lit(1000)).cast("double") / 500.0).as("v"))
      val small = series(kSmall).cache(); small.count()
      timed(s"pairwiseCorr EXACT K=$kSmall (quadratic reference)") {
        println(s"[scaleprobe] corr_exact_pairs = ${graft.ts.TsAlgebra
          .pairwiseCorr(small, "k", "t", "v", bucketMs = 3600000L, minBuckets = 5,
            maxSeries = kSmall.toLong).count()}")
      }
      timed(s"topCorrelatedPairs K=$kSmall") {
        println(s"[scaleprobe] corr_pruned_pairs = ${graft.ts.TsAlgebra
          .topCorrelatedPairs(small, "k", "t", "v", bucketMs = 3600000L, minBuckets = 5)
          .count()}")
      }
      small.unpersist()
      val kBig = kSmall * mult
      // the guard refuses the quadratic path at this K — by design
      try {
        graft.ts.TsAlgebra.pairwiseCorr(series(kBig), "k", "t", "v", bucketMs = 3600000L)
        println("[scaleprobe] ERROR: guard did not fire")
      } catch {
        case e: IllegalArgumentException =>
          println(s"[scaleprobe] corr_guard_at_${kBig} = refused (${e.getMessage.take(60)}...)")
      }
      val big = series(kBig).cache(); big.count()
      timed(s"topCorrelatedPairs K=$kBig (${mult}x series)") {
        println(s"[scaleprobe] corr_pruned_pairs_big = ${graft.ts.TsAlgebra
          .topCorrelatedPairs(big, "k", "t", "v", bucketMs = 3600000L, minBuckets = 5)
          .count()}")
      }
      big.unpersist()
      spark.stop()
      return
    }
    // semantic-dedup mode: runMain graft.ScaleProbe <sfDir> semantic [nlist]
    // — times buildIvfIndex + within-cell pairing at the given (or
    // occupancy-aware) nlist; the numbers behind the ivfListsFor sizing
    // rule in BENCH_NOTES
    // ppjoin-funnel mode: runMain graft.ScaleProbe <sfDir> ppjoin [tau]
    if (ppjoinMode) {
      import org.apache.spark.sql.functions.col
      val t = if (args.length > 2) args(2).toDouble else 0.5
      // "exactfirst": the documented pipeline order for dense-dup corpora —
      // collapse identical texts via Dedup.exact, ppjoin only the residue
      // (one representative per exact-dup class)
      val exactFirst = args.length > 3 && args(3) == "exactfirst"
      val docsAll = Tables.documents(spark, sfDir)
      val docs =
        if (!exactFirst) docsAll
        else {
          val before = docsAll.count()
          val residue = docsAll
            .join(
              Dedup.exact(docsAll, "doc_id", "text")
                .select(col("canonical_id").as("doc_id")),
              Seq("doc_id"), "left_semi")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          println(s"[scaleprobe] exact_first: $before docs -> ${residue.count()} residue docs")
          residue
        }
      val f = timed(s"ppjoin funnel tau=$t") {
        Dedup.ppjoinFunnel(docs, "doc_id", "text", n = 3, tau = t)
      }
      f.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"[scaleprobe] $k = $v") }
      spark.stop()
      return
    }
    // graph mode: runMain graft.ScaleProbe <sfDir> graph [mult] [shThresh]
    // — build the sf-dir's co-purchase graph, replicate it `mult`x with
    // offset node ids (disjoint copies — fixed per-component density, so
    // the probe measures KERNEL scaling, not graph densification), and
    // time the degree-ordered triangle count. NOTE the 10x events
    // replica fixture is the WRONG input here: it multiplies users over
    // the same 100-item space, so the co-occurrence graph itself
    // densifies quadratically (a data-model artifact of the fixture's
    // fixed key space, the pathology the query's per-item cap cuts off).
    if (graphMode) {
      import org.apache.spark.sql.functions._
      val mult = if (args.length > 2) args(2).toInt else 1
      val sh = if (args.length > 3) args(3).toInt else 3
      val uk = Tables.events(spark, sfDir)
        .where(col("event_type") === "purchase")
        .select(col("user_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .distinct()
      val kept = uk.join(
        uk.groupBy(col("k")).agg(count(lit(1)).as("nu"))
          .where(col("nu") <= 100000).select(col("k")),
        Seq("k"))
      val base = kept.as("x")
        .join(kept.as("y"), col("x.k") === col("y.k") && col("x.user_id") < col("y.user_id"))
        .groupBy(col("x.user_id").as("ua"), col("y.user_id").as("ub"))
        .agg(count(lit(1)).as("shn"))
        .where(col("shn") >= sh)
      val pairs = (if (mult <= 1) base
        else
          base.crossJoin(spark.range(mult.toLong).select(col("id").as("rep")))
            .select(
              (col("ua") + col("rep") * 10000000L).as("ua"),
              (col("ub") + col("rep") * 10000000L).as("ub")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = timed(s"edge build (co-purchase pairs, ${mult}x replicas)")(pairs.count())
      try {
        timed(s"triangles (degree-ordered wedge join) on $m edges") {
          val t = graft.ext.Graph.triangles(pairs, "ua", "ub")
            .agg(
              count(lit(1)).as("nodes"),
              // triangle-free graph → zero rows → NULL aggregates
              coalesce(sum("n_tri"), lit(0L)).as("tri3"),
              coalesce(max("deg"), lit(0L)).as("max_deg"))
            .head()
          val bound = math.sqrt(2.0 * m).toLong
          println(s"[scaleprobe] nodes=${t.getLong(0)} triangles=${t.getLong(1) / 3} " +
            s"max_deg=${t.getLong(2)} orient_bound_sqrt2m=$bound")
        }
      } finally pairs.unpersist()
      spark.stop()
      return
    }
    // contain mode: runMain graft.ScaleProbe <sfDir> contain [tau] — the
    // containment candidate funnel: how far the asymmetric prefix filter
    // prunes below the naive all-pairs shingle join
    if (containMode) {
      val t = if (args.length > 2) args(2).toDouble else 0.8
      val f = timed(s"containment funnel tau=$t") {
        Dedup.containmentFunnel(Tables.documents(spark, sfDir), "doc_id", "text", n = 3, tau = t)
      }
      f.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"[scaleprobe] $k = $v") }
      spark.stop()
      return
    }
    // excise mode: runMain graft.ScaleProbe <sfDir> excise — time the
    // corpus-wide duplicated-span excision (CDC chunk -> keep-first
    // election -> reconstruct); counts prove output-bound growth
    if (exciseMode) {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(spark, sfDir)
      println(s"[scaleprobe] docs = ${docs.count()}")
      timed("exciseDuplicateChunks (chunk + elect + reconstruct)") {
        val out = Dedup.exciseDuplicateChunks(docs, "doc_id", "text")
          .agg(
            count(lit(1)).as("docs"), sum("n_chunks").as("chunks"),
            sum("n_kept").as("kept"), sum(length(col("clean_text"))).as("clean_chars"))
          .head()
        println(s"[scaleprobe] excise docs=${out.getLong(0)} chunks=${out.getLong(1)} " +
          s"kept=${out.getLong(2)} clean_chars=${out.getLong(3)}")
      }
      // exact-substring excision at 1x and multx (arg 3, default 10):
      // replication with fresh ids multiplies TRUE duplicated runs —
      // every replica excises against the corpus-first copy, so removal
      // volume is output-bound (~linear in corpus), never pair-shaped;
      // the agg-min election keeps a 10^6-duplicated window one combined
      // row per task. Sub-quadratic = multx wall far below mult^2.
      val xmult = if (args.length > 2) args(2).toInt else 10
      def xsub(d: org.apache.spark.sql.DataFrame, label: String): Unit =
        timed(s"exciseExactSubstrings w=8 $label") {
          val out = Dedup.exciseExactSubstrings(d, "doc_id", "text", w = 8)
            .agg(
              count(lit(1)).as("docs"), sum("n_spans").as("spans"),
              sum("n_tokens_removed").as("removed"),
              sum(length(col("clean_text"))).as("clean_chars"))
            .head()
          println(s"[scaleprobe] xsub_$label docs=${out.getLong(0)} spans=${out.getLong(1)} " +
            s"removed=${out.getLong(2)} clean_chars=${out.getLong(3)}")
        }
      xsub(docs, "1x")
      val repl = docs
        .crossJoin(broadcast(spark.range(xmult.toLong).select(col("id").as("_rep"))))
        .select(
          (col("doc_id") + col("_rep") * 10000000L).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
      xsub(repl, s"${xmult}x")
      // dense-span probe: one boilerplate-saturated doc with k DISJOINT
      // duplicated 8-gram runs (unique separators block span merging).
      // The per-token exists(spans, ...) lambda this kernel replaced was
      // O(tokens x spans) — quadratic here (k=20k: ~3.6e9 span probes
      // in one task); the merged sorted span-walk is O(tokens + spans),
      // so 10x spans must cost ~10x, not 100x.
      locally {
        import spark.implicits._
        def dense(k: Int): Unit = {
          def mk(sep: String) = (0 until k).map(i =>
            (0 until 8).map(j => s"ph${i}_$j").mkString(" ") + s" $sep$i").mkString(" ")
          val sat = Seq((0L, mk("own")), (1L, mk("tgt"))).toDF("doc_id", "text")
          timed(s"xsub dense-span k=$k") {
            val out = Dedup.exciseExactSubstrings(sat, "doc_id", "text", w = 8)
              .agg(sum("n_spans").as("spans"), sum("n_tokens_removed").as("removed"))
              .head()
            println(s"[scaleprobe] xsub_dense k=$k spans=${out.getLong(0)} " +
              s"removed=${out.getLong(1)}")
          }
        }
        dense(2000)
        dense(20000)
      }
      spark.stop()
      return
    }
    // phash mode: runMain graft.ScaleProbe <sfDir> phash — synthesize the
    // mmph fixture shape, time blockhash + banded Hamming pairs
    if (phashMode) {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      import graft.ext.Multimodal
      val payloads = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val payload =
            if (id % 5 == 4) text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            else {
              val g = (id % 16).toInt
              Multimodal.synthImage(
                if (g % 2 == 0) "png" else "bmp",
                8 + (g * 3) % 40, 8 + (g * 7) % 40, salt = ((id / 16) % 3).toInt)
            }
          (id, payload)
        })
        .toDF("doc_id", "payload")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[scaleprobe] images = ${payloads.count()}")
      val hashes = timed("imageBlockhash (decode + 64-cell hash)") {
        val h = Multimodal.imageBlockhash(payloads, "doc_id", "payload")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[scaleprobe] hash_rows = ${h.count()} markers = ${h.where(!col("ok")).count()}")
        h
      }
      timed("imagePhashPairs (banded Hamming <= 3)") {
        println(s"[scaleprobe] phash_pairs = ${Multimodal.imagePhashPairs(payloads, "doc_id", "payload", maxDist = 3).count()}")
      }
      timed("imagePhashPairs EXACT-FIRST (collapse + banded + expand)") {
        println(s"[scaleprobe] phash_pairs_exactfirst = ${Multimodal.imagePhashPairs(payloads, "doc_id", "payload", maxDist = 3, exactFirst = true).count()}")
      }
      hashes.unpersist()
      spark.stop()
      return
    }
    // ledger mode: runMain graft.ScaleProbe <sfDir> ledger — time the
    // full curation-ledger composition (quality LR + near-dup clusters +
    // contamination -> one row per doc); status distribution printed so
    // growth is checked on verdict counts, not wall alone
    if (ledgerMode) {
      import org.apache.spark.sql.functions._
      import graft.ext.{Curation, Dedup, Sampling, TextAnalysis}
      val docs = Tables.documents(spark, sfDir)
      println(s"[scaleprobe] docs = ${docs.count()}")
      timed("curation ledger (quality + clusters + contamination + splits)") {
        val q = TextAnalysis.qualityLr(docs, "doc_id", "text")
        val clusters = Dedup.clusters(
          Dedup.minhashLshPairs(docs, "doc_id", "text", tau = 0.5))
        val cont = Dedup.contaminationPairs(
          docs.where(col("doc_id") >= 20), docs.where(col("doc_id") < 20),
          "doc_id", "text", n = 3, minShared = 2L)
          .select(col("train_id").as("doc_id"))
        val led = Curation.ledger(
          docs, "doc_id", q, clusters, cont,
          Seq(("train", 8.0), ("val", 1.0), ("test", 1.0)), salt = "sp1")
        led.groupBy("status").count().orderBy("status").collect()
          .foreach(r => println(s"[scaleprobe] ledger ${r.getString(0)} = ${r.getLong(1)}"))
      }
      spark.stop()
      return
    }
    // warc mode: runMain graft.ScaleProbe <sfDir> warc [nArchives] — time
    // archive serialization and the per-file record-walk read-back
    if (warcMode) {
      import org.apache.spark.sql.functions._
      val nArchives = if (args.length > 2) args(2).toInt else 32
      // optional arg 4: replicate the documents mult× with fresh ids —
      // the 500k-record fixture the COUNT(*) pushdown evidence needs
      val docsMult = if (args.length > 4) args(4).toInt else 1
      val docs0 = Tables.documents(spark, sfDir)
      val docs =
        if (docsMult <= 1) docs0
        else docs0
          .crossJoin(broadcast(spark.range(docsMult.toLong).select(col("id").as("_rep"))))
          .select(
            (col("doc_id") + col("_rep") * 10000000L).as("doc_id"),
            col("text"), col("lang"), col("source"), col("n_chars"))
      println(s"[scaleprobe] docs = ${docs.count()}")
      val dir = java.nio.file.Files.createTempDirectory("warc_probe").toString
      timed(s"writeArchives (nArchives=$nArchives)") {
        graft.sources.Warc.writeArchives(docs, dir, nArchives)
      }
      timed("readArchivesCounted (record walk + full consume)") {
        val scan = graft.sources.Warc.readArchivesCounted(spark, dir)
        println(s"[scaleprobe] warc_clean = ${scan.docs.count()} rejects = ${scan.rejects}")
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      // member-gzipped + indexed: the record-granular split path — the
      // evidence row is the split count (work units) vs the archive
      // count, i.e. how many tasks one fat archive becomes
      val gdir = java.nio.file.Files.createTempDirectory("warcgz_probe").toString
      timed(s"writeArchivesGz (nArchives=$nArchives, member-indexed)") {
        graft.sources.Warc.writeArchivesGz(docs, gdir, nArchives)
      }
      // production default membersPerSplit unless overridden (arg 3):
      // splits ~ a few per core; finer grids pay local-mode task-launch
      // overhead without buying parallelism
      val mps = if (args.length > 3) args(3).toInt else 4096
      val nSplits = graft.sources.Warc.gzMemberSplits(spark, gdir, mps).count()
      println(s"[scaleprobe] gz_splits = $nSplits over $nArchives archives " +
        f"(membersPerSplit=$mps, parallelism ratio ${nSplits.toDouble / nArchives}%.1fx)")
      timed("readArchivesGzIndexedCounted (positioned range reads)") {
        val scan = graft.sources.Warc.readArchivesGzIndexedCounted(spark, gdir, mps)
        println(s"[scaleprobe] warcgz_idx_clean = ${scan.docs.count()} rejects = ${scan.rejects}")
      }
      // DSv2 route: driver-planned byte ranges, zero planning jobs.
      // (These run BEFORE the whole-file walks: those allocate 2 GiB
      // humongous buffers whose G1 fragmentation contaminates every
      // later measurement in this JVM — observed 1.4 s → 9-32 s on
      // identical reads.)
      val dsv2 = spark.read.format("warcgz")
        .option("maxSplitBytes", 4L << 20).load(gdir)
      println(s"[scaleprobe] dsv2_partitions = ${dsv2.rdd.getNumPartitions}")
      timed("DSv2 format(\"warcgz\") full read") {
        println(s"[scaleprobe] dsv2_clean = ${dsv2.where(org.apache.spark.sql.functions.col("_ok")).count()}")
      }
      // toRdd, not count(): a bare count over this source now pushes to
      // the sidecars (below) — this row must keep measuring the pruned
      // HEADER WALK
      timed("DSv2 pruned read (doc_id only — body decode skipped)") {
        println(s"[scaleprobe] dsv2_ids = ${dsv2.select("doc_id").queryExecution.toRdd.count()}")
      }
      // aggregate pushdown: a bare COUNT(*) is answered from the .idx
      // sidecars (per-partition member counts, zero member decode) —
      // against the pruned header walk above as the no-push baseline
      timed("DSv2 COUNT(*) pushed (sidecar member counts — zero decode)") {
        println(s"[scaleprobe] dsv2_count_pushed = ${dsv2.count()}")
      }
      // filter pushdown: a selective header predicate skips the body
      // decode of every non-matching record. sum(length(text)) forces
      // text into the required schema (a count() would prune it and
      // measure nothing); the no-push twin is the SAME reader with the
      // predicate made unpushable, so decode-skip is the only variable
      val selBound = math.max(1L, docs.count() / 100L)
      import org.apache.spark.sql.functions.{col => c, length, sum => fsum}
      timed(s"DSv2 selective+text (doc_id < $selBound pushed — 99% of bodies undecoded)") {
        println(s"[scaleprobe] dsv2_selective_chars = ${dsv2
          .where(c("doc_id") < selBound)
          .agg(fsum(length(c("text")))).head.getLong(0)}")
      }
      // abs(doc_id) is unpushable (WarcGzFilters supports bare columns
      // only) and Catalyst cannot fold it away — the old "+ 0L" idiom IS
      // constant-folded in Spark 4 and silently measured a pushed read
      timed("DSv2 selective+text NO pushdown (abs(doc_id) defeats it — every body decoded)") {
        println(s"[scaleprobe] dsv2_nopush_chars = ${dsv2
          .where(abs(c("doc_id")) < selBound)
          .agg(fsum(length(c("text")))).head.getLong(0)}")
      }
      // zone-map skip: RANGE-partitioned archives (DSv2 writer, one
      // archive per partition) give each sidecar a disjoint doc_id zone,
      // so a selective range predicate REFUTES N−1 of N archives from
      // their #zmap lines alone — those tasks never position-read a
      // data byte. The pmod layout above can't show this (every archive
      // spans the full id range); real corpora partitioned by crawl
      // date / source get it for free. Twin rows: same predicate pushed
      // (zones skip) vs arithmetically defeated (every header walked) —
      // wall scales with archives TOUCHED, not archives present.
      val zdir = java.nio.file.Files.createTempDirectory("warczmap_probe").toString
      timed(s"DSv2 write range-partitioned ($nArchives archives, zone-mapped sidecars)") {
        docs.repartitionByRange(nArchives, c("doc_id"))
          .sortWithinPartitions("doc_id")
          .write.format("warcgz").mode("overwrite").save(zdir)
      }
      // bytes-touched instrumentation: local[n] runs every reader in this
      // JVM, so Hadoop's global "file"-scheme statistics sum exactly the
      // positioned reads the tasks issue — the direct "archives touched"
      // signal (wall at this corpus size is task-launch noise)
      def fsBytesRead(): Long = {
        var b = 0L
        val it = org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics.iterator()
        while (it.hasNext) {
          val st = it.next()
          if (st.getScheme == "file") b = st.getLong("bytesRead")
        }
        b
      }
      val zread = spark.read.format("warcgz").load(zdir)
      val zb0 = fsBytesRead()
      timed(s"zone-selective read (doc_id < $selBound pushed — zones skip N-1 archives)") {
        println(s"[scaleprobe] zmap_selective_chars = ${zread
          .where(c("doc_id") < selBound)
          .agg(fsum(length(c("text")))).head.getLong(0)}")
      }
      val zb1 = fsBytesRead()
      timed("zone-defeated read (abs(doc_id) unpushable — every archive walked+decoded)") {
        println(s"[scaleprobe] zmap_defeated_chars = ${zread
          .where(abs(c("doc_id")) < selBound)
          .agg(fsum(length(c("text")))).head.getLong(0)}")
      }
      val zb2 = fsBytesRead()
      println(f"[scaleprobe] zmap_bytes_selective = ${zb1 - zb0} vs defeated ${zb2 - zb1} " +
        f"(${(zb2 - zb1).toDouble / math.max(1L, zb1 - zb0)}%.1fx fewer bytes touched)")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(zdir))
      timed("readArchivesGzCounted (whole-file walk, the straggler baseline)") {
        val scan = graft.sources.Warc.readArchivesGzCounted(spark, gdir)
        println(s"[scaleprobe] warcgz_whole_clean = ${scan.docs.count()} rejects = ${scan.rejects}")
      }
      // streaming ingest fan-out: ONE archive's sidecar folds into many
      // positioned-read spans inside the micro-batch — the straggler fix
      // applied to the stream (span count == the batch split table's)
      if (nArchives == 1) {
        val spanRows = graft.sources.Warc.gzMemberSplits(spark, gdir, mps).count()
        val stable = s"warcidx_probe_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        timed(s"indexed STREAM ingest of the 1-archive dir ($spanRows spans/micro-batch)") {
          val q = graft.sources.Warc.readArchivesGzIndexedStream(spark, gdir, mps)
            .writeStream.outputMode("append").format("memory").queryName(stable).start()
          try {
            q.processAllAvailable()
            println(s"[scaleprobe] stream_idx_clean = ${spark.table(stable).where(
              org.apache.spark.sql.functions.col("_ok")).count()} spans_per_batch = $spanRows")
          } finally q.stop()
        }
        timed("whole-file STREAM ingest (1 task per archive per micro-batch — the straggler)") {
          val wtable = s"warcwhole_probe_${java.util.UUID.randomUUID().toString.replace("-", "")}"
          val q = graft.sources.Warc.readArchivesGzStream(spark, gdir)
            .writeStream.outputMode("append").format("memory").queryName(wtable).start()
          try {
            q.processAllAvailable()
            println(s"[scaleprobe] stream_whole_clean = ${spark.table(wtable).where(
              org.apache.spark.sql.functions.col("_ok")).count()}")
          } finally q.stop()
        }
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(gdir))
      spark.stop()
      return
    }
    // asof mode: runMain graft.ScaleProbe <sfDir> asof [mult] — the
    // directional as-of joins at mult x the dir's events with a HOT key
    // owning ~1/3 of all rows (worst realistic series skew): confirms
    // the one-exchange claim and measures the skewed-key wall time for
    // BENCH_NOTES' 100x table
    // detect mode: runMain graft.ScaleProbe <sfDir> detect — the fold
    // detectors (new + reference-shape) over the dir's full events table:
    // wall must track rows ~linearly (one exchange + O(1)-state streams)
    if (detectMode) {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val ev = Tables.events(spark, sfDir)
        .select(
          col("user_id").cast("string").as("seriesKey"),
          col("ts_ms").as("tsMs"), col("value"))
        .as[graft.model.TsSample]
      println(s"[scaleprobe] detect_rows = ${ev.count()}")
      timed("cusumScores (stats join + clamped-accumulation fold)") {
        println(s"[scaleprobe] cusum_rows = ${graft.detect.Detectors.cusumScores(ev).count()}")
      }
      timed("holtScores (level+trend fold + stddev normalization)") {
        println(s"[scaleprobe] holt_rows = ${graft.detect.Detectors.holtScores(ev).count()}")
      }
      timed("expAvgScores (the reference-shape fold, for comparison)") {
        println(s"[scaleprobe] expavg_rows = ${graft.detect.Detectors.expAvgScores(ev).count()}")
      }
      spark.stop()
      return
    }
    // tsops mode: runMain graft.ScaleProbe <sfDir> tsops [mult] — replicates
    // events mult× with DISTINCT series keys per replica (throughput
    // scaling of the seasonal/spectral family: hwScores fold, exact-int
    // ACF, periodogram). The row count grows mult×, the per-series length
    // stays constant — the 100 TB shape (more series, not longer ones).
    if (tsopsMode) {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val mult = if (args.length > 2) args(2).toInt else 100
      val ev = Tables.events(spark, sfDir).select(col("user_id"), col("ts_ms"), col("value"))
      val reps = spark.range(mult.toLong).select(col("id").as("rep"))
      val big = ev.crossJoin(broadcast(reps))
        .select(
          (col("user_id") + col("rep") * 1000000L).as("user_id"),
          col("ts_ms"), col("value"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[scaleprobe] tsops rows = ${big.count()}")
      val pts = big.select(
        col("user_id").cast("string").as("seriesKey"),
        col("ts_ms").as("tsMs"), col("value")).as[graft.model.TsSample]
      // toRdd.count() forces EVERY output column: a plain count() lets
      // Catalyst prune the aggregate/struct columns straight out of the
      // plan (measured: periodogram "ran" 10x faster under count() with
      // all 46 trig sums pruned — a probe measuring nothing)
      def force(d: org.apache.spark.sql.DataFrame): Long = d.queryExecution.toRdd.count()
      timed("hwScores (level+trend+seasonal fold + stddev normalization)") {
        println(s"[scaleprobe] hw_rows = ${force(graft.detect.Detectors.hwScores(pts))}")
      }
      timed("acf lags 1..8 (lag window + exact-int estimator)") {
        println(s"[scaleprobe] acf_rows = ${force(graft.ts.TsAlgebra.acf(big, "user_id", "ts_ms", "value", 8))}")
      }
      timed("periodogram periods 2..24 (rank/total windows + 46 trig sums)") {
        println(s"[scaleprobe] pg_rows = ${force(graft.ts.TsAlgebra.periodogram(big, "user_id", "ts_ms", "value", 2 to 24))}")
      }
      // count the FINAL plan only: AQE's executedPlan text appends the
      // "== Initial Plan ==" section, which double-counts every exchange
      def exchanges(d: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(d.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)).length
      // the r12 additions (VERDICT r13 ask #3): the STL→ESD composition,
      // changepoint, and seasonal strength at the same more-series shape,
      // with the exchange count pinned in the output
      timed("sesd (STL fixed point -> edge trim -> integer ESD, k=3)") {
        val w = org.apache.spark.sql.expressions.Window
        val trimmed = graft.ts.TsAlgebra
          .stlDecompose(big, "user_id", "ts_ms", "value", period = 24)
          .withColumn("_rn", row_number().over(w.partitionBy("user_id").orderBy("ts_ms")))
          .withColumn("_nn", count(lit(1)).over(w.partitionBy("user_id")))
          .where(col("_rn") > 12 && col("_rn") <= col("_nn") - 12)
        val out = graft.detect.Detectors
          .esdOutliersFp(trimmed, "user_id", "ts_ms", "resid_fp", k = 3, cut = 3)
        println(s"[scaleprobe] sesd_rows = ${force(out)} sesd_exchanges = ${exchanges(out)}")
      }
      timed("changepoint (depth-1 binary segmentation)") {
        val out = graft.ts.TsAlgebra.changepoint(big, "user_id", "ts_ms", "value")
        println(s"[scaleprobe] cp_rows = ${force(out)} cp_exchanges = ${exchanges(out)}")
      }
      timed("seasonalStrength (STL chain + variance-ratio aggregate)") {
        val out = graft.ts.TsAlgebra.seasonalStrength(big, "user_id", "ts_ms", "value", period = 24)
        println(s"[scaleprobe] ss_rows = ${force(out)} ss_exchanges = ${exchanges(out)}")
      }
      spark.stop()
      return
    }
    if (asofMode) {
      import org.apache.spark.sql.functions._
      val mult = if (args.length > 2) args(2).toInt else 100
      val ev = Tables.events(spark, sfDir).select(
        col("user_id").cast("string").as("seriesKey"),
        col("ts_ms").as("tsMs"), col("value"))
      val reps = spark.range(mult.toLong).select(col("id").as("rep"))
      // every 3rd replica folds onto ONE series key; tsMs is perturbed
      // per replica so the hot series is long, not duplicated
      val big = ev.crossJoin(broadcast(reps))
        .select(
          when(col("rep") % 3 === 0, lit("hot"))
            .otherwise(concat(col("seriesKey"), lit("#"), col("rep"))).as("seriesKey"),
          (col("tsMs") + col("rep") * 7L).as("tsMs"),
          col("value"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = big.count()
      val hot = big.where(col("seriesKey") === "hot").count()
      println(f"[scaleprobe] asof rows = $n hot-key rows = $hot (${100.0 * hot / n}%.1f%%)")
      val baseline = big.where(col("tsMs") % 2 === 0)
        .select(col("seriesKey"), col("tsMs"), col("value").as("baseline"))
      Seq(graft.ts.AsOfJoin.Backward, graft.ts.AsOfJoin.Forward, graft.ts.AsOfJoin.Nearest)
        .foreach { d =>
          timed(s"asof $d x$mult skewed") {
            val out = graft.ts.AsOfJoin.join(big, baseline, d, 3600000L)
            println(s"[scaleprobe] asof_${d}_rows = ${out.count()}")
            val exchanges = "Exchange hashpartitioning".r
              .findAllIn(out.queryExecution.executedPlan.toString).length
            println(s"[scaleprobe] asof_${d}_exchanges = $exchanges")
          }
        }
      big.unpersist()
      spark.stop()
      return
    }
    // video mode: runMain graft.ScaleProbe <sfDir> video — synthesize the
    // mmvid fixture shape over the dir's documents, time frame demux +
    // decode + per-frame embeddings + pooled video near-dup pairs
    if (videoMode) {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // module accessed statically inside the lambda — assigning the
      // object to a local val would capture (and fail to serialize) it
      import graft.ext.Multimodal
      val payloads = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          (id, Multimodal.synthAviFixture(id, text))
        })
        .toDF("doc_id", "payload")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[scaleprobe] videos = ${payloads.count()}")
      val ff = timed("frameFeatures (demux+decode+grid)") {
        val f = Multimodal.frameFeatures(payloads.where(col("doc_id") % 3 < 2), "doc_id", "payload", everyN = 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[scaleprobe] frame_feature_rows = ${f.count()}")
        f
      }
      timed("pooled video near-dup pairs") {
        val pooled = Multimodal.pooledVideoEmbedding(ff)
        println(s"[scaleprobe] video_pairs = ${graft.ext.Similarity.cosinePairs(pooled, "id", "embedding", tau = 0.999, maxBroadcastRows = 5000000L).count()}")
      }
      timed("sceneCuts + shotSegments over the frame table") {
        println(s"[scaleprobe] cut_rows = ${Multimodal.sceneCuts(ff, tauFp = 6000L).count()}")
        println(s"[scaleprobe] shot_rows = ${Multimodal.shotSegments(ff, tauFp = 6000L).count()}")
      }
      spark.stop()
      return
    }
    // videolsh mode: runMain graft.ScaleProbe <sfDir> videolsh — the
    // BANDED route for video near-dup (videoNearDup with the broadcast
    // cap forced to 0): demux+decode once, then pooled vectors through
    // lshPairs — the path a >cap corpus runs; pair count printed so
    // growth is checked on output size, not wall alone
    if (videoLshMode) {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      import graft.ext.Multimodal
      val payloads = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          (id, Multimodal.synthAviFixture(id, text))
        })
        .toDF("doc_id", "payload")
      val ff = Multimodal.frameFeatures(
          payloads.where(col("doc_id") % 3 < 2), "doc_id", "payload", everyN = 1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[scaleprobe] frame_feature_rows = ${ff.count()}")
      timed("videoNearDup via BANDED lshPairs (maxBroadcastRows=0)") {
        println(s"[scaleprobe] video_lsh_pairs = ${Multimodal.videoNearDup(ff, tau = 0.999, maxBroadcastRows = 0L).count()}")
      }
      timed("videoNearDup EXACT-FIRST collapse + banded + expand") {
        println(s"[scaleprobe] video_lsh_pairs_exactfirst = ${Multimodal.videoNearDup(ff, tau = 0.999, maxBroadcastRows = 0L, exactFirst = true).count()}")
      }
      spark.stop()
      return
    }
    // audio mode: runMain graft.ScaleProbe <sfDir> audio — synthesize the
    // mmwave fixture shape over the dir's documents, time PCM decode +
    // window stats, pooled embeddings, and near-dup pairs on BOTH routes
    if (audioMode) {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      import graft.ext.Multimodal
      // optional stage filter: "audio exactfirstonly" skips the raw
      // banded stage (807 s at 10x dense-twin — measured once, no need
      // to re-pay it to time the collapse+expand alternative)
      val exactFirstOnly = args.length > 2 && args(2) == "exactfirstonly"
      val payloads = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val g = (id % 16).toInt
          val p =
            if (id % 7 == 6) text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            else Multimodal.synthWav(8000 * (1 + g % 3), 1 + g % 2, 40 + 5 * g, seed = g)
          (id, p)
        })
        .toDF("doc_id", "payload")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[scaleprobe] audio_docs = ${payloads.count()}")
      if (!exactFirstOnly) {
        timed("audioFeatures (PCM decode + window stats)") {
          println(s"[scaleprobe] feature_rows = ${Multimodal.audioFeatures(payloads, "doc_id", "payload").count()}")
        }
        timed("audioNearDup EXACT broadcast kernel") {
          println(s"[scaleprobe] audio_pairs_exact = ${Multimodal.audioNearDup(payloads, "doc_id", "payload", tau = 0.999, maxBroadcastRows = 5000000L).count()}")
        }
        timed("audioNearDup BANDED lshPairs route") {
          println(s"[scaleprobe] audio_pairs_lsh = ${Multimodal.audioNearDup(payloads, "doc_id", "payload", tau = 0.999, maxBroadcastRows = 0L).count()}")
        }
      }
      timed("audioNearDup EXACT-FIRST collapse + banded + expand") {
        println(s"[scaleprobe] audio_pairs_exactfirst = ${Multimodal.audioNearDup(payloads, "doc_id", "payload", tau = 0.999, maxBroadcastRows = 0L, exactFirst = true).count()}")
      }
      spark.stop()
      return
    }
    // splitsafe mode: runMain graft.ScaleProbe <sfDir> splitsafe — time
    // the cluster-aware split (pair graph -> LP clusters -> keyed join)
    // and verify the zero-straddle invariant holds at this scale
    if (splitSafeMode) {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[scaleprobe] docs = ${docs.count()}")
      val pairs = timed("minhashLshPairs (auto cap)") {
        val p = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, perms = 16, bands = 4, tau = 0.3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[scaleprobe] pairs = ${p.count()}")
        p
      }
      val clusters = timed("clusters (LP fixpoint)") {
        val c = Dedup.clusters(pairs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[scaleprobe] cluster_members = ${c.count()}")
        c
      }
      val safe = timed("assignSplitByCluster (keyed join + hash intervals)") {
        val s2 = graft.ext.Sampling.assignSplitByCluster(
          docs, "doc_id", clusters, Seq(("train", 8.0), ("val", 1.0), ("test", 1.0)), "sp1")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[scaleprobe] assigned = ${s2.count()}")
        s2
      }
      timed("straddle invariant check") {
        val bySplit = safe.select(col("doc_id"), col("split"))
        val straddling = pairs
          .join(bySplit.select(col("doc_id").as("da"), col("split").as("sa")), "da")
          .join(bySplit.select(col("doc_id").as("db"), col("split").as("sb")), "db")
          .where(col("sa") =!= col("sb"))
          .count()
        println(s"[scaleprobe] straddling_pairs = $straddling (must be 0)")
      }
      spark.stop()
      return
    }
    // lshidx mode: runMain graft.ScaleProbe <sfDir> lshidx — build+persist
    // the LSH index on embeddings (auto bits), then time the pairs probe
    // on the STORED layout twice (build-inclusive vs steady)
    if (lshIdxMode) {
      val Sim = graft.ext.Similarity
      val emb = Tables.embeddings(spark, sfDir)
      val path = java.nio.file.Files.createTempDirectory("lshidx_probe").toString
      timed("buildLshIndex + writeLshIndex") {
        Sim.writeLshIndex(Sim.buildLshIndex(emb, "vec_id", "embedding", dims = 64), path)
      }
      val idx = Sim.readLshIndex(spark, path)
      println(s"[scaleprobe] n_bits = ${idx.nBits}")
      timed("lshPairsOn (first read)") {
        println(s"[scaleprobe] pairs = ${Sim.lshPairsOn(idx, tau = 0.4).count()}")
      }
      timed("lshPairsOn (steady)") {
        println(s"[scaleprobe] pairs2 = ${Sim.lshPairsOn(idx, tau = 0.4).count()}")
      }
      spark.stop()
      return
    }
    if (semanticMode) {
      val emb = Tables.embeddings(spark, sfDir)
      val n = emb.count()
      val nlist =
        if (args.length > 2) args(2).toInt else graft.ext.Similarity.ivfListsFor(n)
      timed(s"semanticPairs n=$n nlist=$nlist") {
        val idx = graft.ext.Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = nlist)
        println(s"[scaleprobe] sem_pairs = ${graft.ext.Similarity.semanticPairs(idx, 0.4).count()}")
      }
      spark.stop()
      return
    }
    val docs = Tables.documents(spark, sfDir)
    val funnel = timed("minhash funnel") {
      Dedup.minhashLshFunnel(docs, "doc_id", "text", tau = tau, maxBucket = maxBucket)
    }
    funnel.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"[scaleprobe] $k = $v") }
    val pairs = timed("minhashLshPairs materialize") {
      val p = Dedup.minhashLshPairs(docs, "doc_id", "text", tau = tau, maxBucket = maxBucket)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[scaleprobe] pairs = ${p.count()}")
      p
    }
    // the graph_pagerank edge slice: pairs whose endpoints live in
    // DIFFERENT sources — the count a fixed maxBucket zeroed at 100×
    timed("cross-source pairs") {
      import org.apache.spark.sql.functions.col
      val src = docs.select(col("doc_id"), col("source"))
      val cross = pairs
        .join(src.select(col("doc_id").as("da"), col("source").as("sa")), "da")
        .join(src.select(col("doc_id").as("db"), col("source").as("sb")), "db")
        .where(col("sa") =!= col("sb"))
        .count()
      println(s"[scaleprobe] cross_source_pairs = $cross")
    }
    timed("clusters") {
      val (cl, rounds) = Dedup.clustersWithRounds(pairs)
      val n = cl.count()
      println(s"[scaleprobe] cluster_rows = $n, lp_rounds = $rounds")
    }
    spark.stop()
  }
}
