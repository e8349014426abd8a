package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._

object IvfTune {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get("ivf-tune")
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact10 = Similarity.cosineTopK(e, "vec_id", "embedding", col("id") < 10, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    for (nlist <- Seq(8, 16); iters <- Seq(2); nprobe <- Seq(4, 6, 8)) {
      val idx = Similarity.buildIvfIndex(e, "vec_id", "embedding", nlist = nlist, iters = iters)
      val sizes = idx.assigned.groupBy("cell").count().orderBy("cell")
        .collect().map(r => r.getAs[Long]("count")).mkString(",")
      val ivf = Similarity.ivfProbe(idx, col("id") < 10, k = 5, nprobe = nprobe)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      val recall = (exact10 intersect ivf).size.toDouble / exact10.size
      println(s"RECALL lloyd nlist=$nlist iters=$iters nprobe=$nprobe -> $recall  sizes=[$sizes]")
    }
    // MLlib spherical KMeans comparison (round-2 quantizer): same probe path
    {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val spark2 = spark
      import spark2.implicits._
      val prep = Similarity.prepared(e, "vec_id", "embedding")
      val unit = transform(col("vec"), x => when(col("nrm") > 0, x / col("nrm")).otherwise(x))
      val all = prep.withColumn("features", array_to_vector(unit))
      for (nlist <- Seq(8, 16)) {
        val model = new KMeans().setK(nlist).setSeed(42L).setFeaturesCol("features").setPredictionCol("cell").fit(all)
        val assigned = model.transform(all).select("id", "vec", "nrm", "cell")
        val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq.toDF("cid", "cvec")
        val idx = Similarity.IvfIndex(centroids, assigned)
        val sizes = assigned.groupBy("cell").count().orderBy("cell")
          .collect().map(r => r.getAs[Long]("count")).mkString(",")
        val ivf = Similarity.ivfProbe(idx, col("id") < 10, k = 5, nprobe = 4)
          .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
        val recall = (exact10 intersect ivf).size.toDouble / exact10.size
        println(s"RECALL kmeans nlist=$nlist nprobe=4 -> $recall  sizes=[$sizes]")
      }
    }
    spark.stop()
  }
}
