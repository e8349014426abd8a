package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming FUZZY decontamination — the ingest-time form of
  * `Dedup.fuzzyDecontamination`: every arriving train document gets a
  * containment verdict against a FIXED eval-probe suite before it
  * reaches the lake, so contaminated pages are flagged at the front
  * door instead of in a later batch sweep. Grain and threshold are the
  * batch kernel's (directed shingle containment C(probe→train) =
  * |S_kept(probe) ∩ S(train)| / |S_kept(probe)| at the same n/τ), and
  * the output is the same per-train-doc LEDGER row (verdict, match
  * count, best probe, action).
  *
  * The probe suite is compiled ONCE at stream setup into an inverted
  * index (shingle hash → probe ordinals) and BROADCAST: eval suites
  * are thousands of items by construction, so the index is a few MB
  * against billions of train docs — the canonical small-side
  * broadcast. A loud guard refuses suites past `maxProbeDocs` rather
  * than silently collecting an unbounded frame to the driver.
  *
  * Semantics note (the honest batch/stream contract): the batch
  * kernel's boilerplate cap uses document frequency over the UNION of
  * train and probe sides; a stream cannot know corpus-global train df
  * at verdict time, so the cap here is computed over the PROBE SUITE
  * ONLY (decidable at setup — a shingle shared across many eval items
  * is boilerplate with no per-item signal). Everything downstream of
  * the df map is IDENTICAL: since the cap is a global hash property,
  * |kept(probe) ∩ kept(train)| = |kept(probe) ∩ raw(train)|, so
  * whenever the two df maps agree under the cap (in particular
  * whenever the cap is inert) the stream ledger equals the batch
  * ledger row for row — spec-pinned in StreamingSpec.
  *
  * State: the verdict itself is STATELESS (one pass over the arriving
  * doc against the broadcast index — no shuffle, no aggregation
  * state). The only state is first-arrival dedup on the doc id via
  * `dropDuplicatesWithinWatermark`, so a re-crawled doc appends its
  * ledger row once per watermark horizon: one (id → event time) entry
  * per doc in the horizon, EVICTED by watermark. A re-delivery later
  * than the delay re-emits (its state was evicted) — the `DedupStream`
  * divergence note; size the delay to the feed's re-delivery window.
  */
object FuzzyDecontamStream {

  /** One train-doc arrival for the replay harness. */
  final case class TrainArrival(docId: Long, tsMs: Long, text: String)

  /** Compiled probe suite: inverted shingle index + per-probe kept
    * sizes. Serializable — broadcast to every task at stream setup.
    */
  final case class ProbeIndex(
      n: Int,
      tau: Double,
      probeIds: Array[Long],
      keptSizes: Array[Long],
      inverted: Map[Long, Array[Int]])

  /** Build the broadcastable probe index from the static probe frame:
    * distinct shingle hashes per probe, probe-side df cap at `maxDf`,
    * probes with fewer than `minShingles` kept shingles dropped (all
    * the batch kernel's rules, probe-side df map per the scaladoc).
    */
  def buildProbeIndex(
      probe: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      tau: Double,
      minShingles: Int = 4,
      maxDf: Int = 100000,
      maxProbeDocs: Int = 500000): ProbeIndex = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    require(minShingles >= 1, s"minShingles must be >= 1, got $minShingles")
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    val cnt = probe.count()
    require(cnt <= maxProbeDocs,
      s"probe suite has $cnt docs > maxProbeDocs=$maxProbeDocs: the index is " +
        "driver-collected and broadcast — a frame this large is not an eval " +
        "suite; raise the cap explicitly if it truly is one")
    val spark = probe.sparkSession
    import spark.implicits._
    val rows = probe
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val words = text.split(" ", -1)
          val hs = (0 to words.length - n).iterator
            .map(i => words.slice(i, i + n).mkString(" "))
            .toSet[String]
            .map(g => graft.ext.Dedup.shingleHash32(md, g))
            .toArray
          (id, hs)
        }
      }
      .collect()
      .sortBy(_._1)
    // probe-side document frequency → boilerplate cap
    val df = new java.util.HashMap[Long, Int]()
    rows.foreach { case (_, hs) => hs.foreach(h => df.merge(h, 1, Integer.sum)) }
    val kept = rows
      .map { case (id, hs) => (id, hs.filter(h => df.get(h) <= maxDf).sorted) }
      .filter(_._2.length >= minShingles)
    val inv = scala.collection.mutable.HashMap.empty[Long, scala.collection.mutable.ArrayBuffer[Int]]
    kept.zipWithIndex.foreach { case ((_, hs), ord) =>
      hs.foreach(h => inv.getOrElseUpdate(h, scala.collection.mutable.ArrayBuffer.empty) += ord)
    }
    ProbeIndex(
      n, tau,
      kept.map(_._1), kept.map(_._2.length.toLong),
      inv.iterator.map { case (h, b) => h -> b.toArray }.toMap)
  }

  /** The streaming operator: first-arrival-wins per doc id within the
    * watermark horizon, then a stateless per-doc containment verdict
    * against the broadcast probe index. Input columns (idCol: long,
    * eventTimeCol: timestamp, textCol: string); output is the batch
    * ledger row (train_id, contaminated, n_probe_matches,
    * best_probe_id, max_containment, action), appended once per doc.
    */
  def fuzzyDecontamStream(
      df: DataFrame,
      idCol: String,
      eventTimeCol: String,
      textCol: String,
      index: ProbeIndex,
      watermarkDelay: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(index)
    df.select(
        col(idCol).cast("long").as("id"),
        col(eventTimeCol).cast("timestamp").as("eventTime"),
        col(textCol).as("text"))
      .withWatermark("eventTime", watermarkDelay)
      .dropDuplicatesWithinWatermark("id")
      .as[(Long, java.sql.Timestamp, String)]
      .mapPartitions { it =>
        val idx = bc.value
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, _, text) =>
          val words = text.split(" ", -1)
          val hs = (0 to words.length - idx.n).iterator
            .map(i => words.slice(i, i + idx.n).mkString(" "))
            .toSet[String]
            .map(g => graft.ext.Dedup.shingleHash32(md, g))
          // per-probe intersection counts via the inverted index — one
          // pass over the doc's distinct shingles, fanout only to the
          // probes that actually share a shingle
          val counts = new java.util.HashMap[Int, Long]()
          hs.foreach { h =>
            idx.inverted.get(h) match {
              case Some(ords) => ords.foreach(o => counts.merge(o, 1L, java.lang.Long.sum))
              case None => ()
            }
          }
          var nMatches = 0L
          var bestOrd = -1
          var bestRounded = -1.0
          val cit = counts.entrySet().iterator()
          while (cit.hasNext) {
            val e = cit.next()
            val ord = e.getKey
            val raw = e.getValue.toDouble / idx.keptSizes(ord)
            // threshold on the RAW ratio (the batch convention); the
            // best-probe election compares the ROUNDED value — the batch
            // ledger's max(struct(containment, -probe_id)) ties two
            // probes whose raw scores round together, then takes the
            // smaller probe id (= smaller ordinal: ids sorted at build)
            if (raw >= idx.tau) {
              nMatches += 1
              val rounded =
                BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
              if (rounded > bestRounded ||
                (rounded == bestRounded && (bestOrd < 0 || ord < bestOrd))) {
                bestRounded = rounded
                bestOrd = ord
              }
            }
          }
          val contaminated = nMatches > 0
          val best: java.lang.Long = if (contaminated) idx.probeIds(bestOrd) else null
          val cont: java.lang.Double = if (contaminated) bestRounded else null
          (id, contaminated, nMatches, best, cont,
            if (contaminated) "drop" else "keep")
        }
      }
      .toDF("train_id", "contaminated", "n_probe_matches", "best_probe_id",
        "max_containment", "action")
  }

  /** Bounded batch-replay for the driver oracle (the `DedupStream`
    * contract): train arrivals feed in ascending docId chunks, one
    * micro-batch each, against an index built from the static probe
    * frame. Replay-scale inputs only; production uses
    * `fuzzyDecontamStream` over a readStream source unchanged.
    */
  def fuzzyDecontamReplay(
      arrivals: Seq[TrainArrival],
      probe: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      tau: Double,
      minShingles: Int,
      maxDf: Int,
      spark: org.apache.spark.sql.SparkSession,
      chunks: Int,
      watermarkDelay: String = "3650 days"): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: SQLContext = spark.sqlContext
    val idx = buildProbeIndex(probe, idCol, textCol, n, tau, minShingles, maxDf)
    val sorted = arrivals.sortBy(_.docId)
    val mem = MemoryStream[TrainArrival]
    val out = fuzzyDecontamStream(
      mem.toDS().select(
        col("docId"), timestamp_millis(col("tsMs")).as("eventTime"), col("text")),
      "docId", "eventTime", "text", idx, watermarkDelay)
    Replay.runSink(spark, out)(q => Replay.feedChunks(q, mem, Replay.chunked(sorted, chunks)))
  }
}
