package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.cosine_sim

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (builder brief). Baseline: brute-force cosine top-k (exact, the
  * oracle). Scale path: random-hyperplane LSH bucketing so the candidate
  * join is an equi-join on bucket ids instead of an O(n²) cross join.
  *
  * All float embeddings are upcast to double before arithmetic so Spark
  * and the DuckDB oracle compute the identical IEEE sequence.
  */
object Similarity {

  /** Index-ordered dot product — same fp evaluation order on both engines. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** (id, vec: array<double>, nrm) view of an embeddings table. */
  def prepared(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val v = col(embCol).cast("array<double>")
    df.select(col(idCol).as("id"), v.as("vec"))
      .withColumn("nrm", sqrt(dot(col("vec"), col("vec"))))
  }

  /** Exact brute-force cosine top-k: the query side is broadcast (small by
    * construction), so the "cross" join is a broadcast nested loop over
    * one pass of the corpus — embarrassingly parallel, no shuffle of the
    * big side; the per-query top-k is a bounded window.
    */
  def cosineTopK(df: DataFrame, idCol: String, embCol: String, queryPred: Column, k: Int): DataFrame = {
    val all = prepared(df, idCol, embCol)
    val q = all.where(queryPred)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val scored = all
      .join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cosine", cosine_sim(col("vec"), col("qvec")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** Exact cosine near-dup pairs above τ: broadcast the corpus as a
    * primitive matrix, stream it once per partition — the all-pairs
    * analogue of a broadcast join (one shuffle-free pass over the big
    * side; ~800 MFLOP/s per core on primitive arrays vs interpreted
    * higher-order array lambdas in a 12.5M-row self-join). Exact all-pairs
    * inherently requires one side to fit in a broadcast; beyond that use
    * `lshBuckets` candidates + this as the verify kernel.
    *
    * fp note: dot products accumulate in index order and divide by the
    * norm product, the same sequence as the `dot`-based SQL oracle.
    */
  def cosinePairs(df: DataFrame, idCol: String, embCol: String, tau: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prep = prepared(df, idCol, embCol)
      .select(col("id"), col("vec"), col("nrm"))
      .as[(Long, Array[Double], Double)]
    val corpus = prep.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(corpus)
    prep
      .mapPartitions { it =>
        val all = bc.value
        it.flatMap { case (ida, va, na) =>
          all.iterator
            .filter(_._1 > ida)
            .flatMap { case (idb, vb, nb) =>
              var s = 0.0
              var i = 0
              while (i < va.length) { s += va(i) * vb(i); i += 1 }
              val cos = s / (na * nb)
              if (cos >= tau) Iterator.single((ida, idb, cos)) else Iterator.empty
            }
        }
      }
      .toDF("va", "vb", "c")
      .select(col("va"), col("vb"), round(col("c"), 4).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component via an LCG over the
    * (bit, dim) index — rational arithmetic, reproducible on any engine.
    */
  private def lcg01(i: Column): Column =
    ((lit(1103515245L) * i + lit(12345L)) % lit(2147483648L)).cast("double") / lit(2147483648.0)

  /** Random-hyperplane LSH bucket id (nBits sign bits). */
  def lshBucket(vec: Column, dims: Int, nBits: Int): Column = {
    val planes = transform(
      sequence(lit(0), lit(nBits - 1)),
      k =>
        aggregate(
          zip_with(
            vec,
            transform(sequence(lit(0), lit(dims - 1)), d => lcg01(k * dims + d) - 0.5),
            (x, h) => x * h),
          lit(0.0),
          (acc, x) => acc + x))
    aggregate(
      zip_with(
        planes,
        sequence(lit(0), lit(nBits - 1)),
        (p, kk) => when(p > 0, pow(lit(2.0), kk).cast("long")).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc + x)
  }

  /** IVF ANN top-k: MLlib KMeans coarse quantizer (deterministic seed)
    * partitions the corpus into nlist cells; each query searches only the
    * nprobe nearest cells. The candidate join is an equi-join on cell id —
    * at 100 TB the corpus is bucketed/partitioned by cell on disk and a
    * probe touches nprobe/nlist of the data. Exact cosine ranks inside
    * the probed cells.
    */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      queryPred: Column,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = df.sparkSession
    import spark.implicits._
    val all = prepared(df, idCol, embCol).withColumn("features", array_to_vector(col("vec")))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setFeaturesCol("features").setPredictionCol("cell")
      .fit(all)
    val assigned = model.transform(all).select("id", "vec", "nrm", "cell")
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq.toDF("cid", "cvec")
    // nprobe nearest centroids per query (tiny cross: queries × nlist)
    val q = assigned.where(queryPred)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val wq = Window.partitionBy("query_id").orderBy(col("dist").asc, col("cid").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn(
        "dist",
        aggregate(zip_with(col("qvec"), col("cvec"), (x, c) => (x - c) * (x - c)), lit(0.0), (a, x) => a + x))
      .withColumn("r", row_number().over(wq))
      .where(col("r") <= nprobe)
      .select(col("query_id"), col("qvec"), col("qnrm"), col("cid"))
    val wk = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("id").asc)
    assigned
      .join(broadcast(probes), col("cell") === col("cid") && col("id") =!= col("query_id"))
      .withColumn("cosine", cosine_sim(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(wk))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** ANN top-k: LSH-bucket the corpus, search only within the query's
    * bucket (equi-join on bucket id — the scale path), exact cosine rank
    * inside the bucket.
    */
  def lshTopK(df: DataFrame, idCol: String, embCol: String, queryPred: Column, k: Int, dims: Int, nBits: Int): DataFrame = {
    val all = prepared(df, idCol, embCol)
      .withColumn("bucket", lshBucket(col("vec"), dims, nBits))
    val q = all.where(queryPred)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("nrm").as("qnrm"), col("bucket"))
    val scored = all
      .join(broadcast(q), Seq("bucket"))
      .where(col("id") =!= col("query_id"))
      .withColumn("cosine", cosine_sim(col("vec"), col("qvec")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }
}
