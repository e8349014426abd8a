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
    val namedMode = semanticMode || ppjoinMode
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
    // semantic-dedup mode: runMain graft.ScaleProbe <sfDir> semantic [nlist]
    // — times buildIvfIndex + within-cell pairing at the given (or
    // occupancy-aware) nlist; the numbers behind the ivfListsFor sizing
    // rule in BENCH_NOTES
    // ppjoin-funnel mode: runMain graft.ScaleProbe <sfDir> ppjoin [tau]
    if (ppjoinMode) {
      val t = if (args.length > 2) args(2).toDouble else 0.5
      val f = timed(s"ppjoin funnel tau=$t") {
        Dedup.ppjoinFunnel(Tables.documents(spark, sfDir), "doc_id", "text", n = 3, tau = t)
      }
      f.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"[scaleprobe] $k = $v") }
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
