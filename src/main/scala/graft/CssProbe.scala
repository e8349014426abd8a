package graft

// scratch probe: which stage of corpus_source_sim anti-scales with cores
object CssProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf0.1x100"
    val spark = Sessions.get("cssprobe")
    case class Agg(var wall: Long = 0, var run: Long = 0, var cpu: Long = 0,
        var gc: Long = 0, var n: Int = 0, var name: String = "")
    val stages = scala.collection.mutable.LinkedHashMap[Int, Agg]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val a = stages.getOrElseUpdate(i.stageId, Agg())
        a.wall = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        a.name = i.name.split("\n").head.take(40)
        a.n = i.numTasks
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val a = stages.getOrElseUpdate(te.stageId, Agg())
        val m = te.taskMetrics
        if (m != null) {
          a.run += m.executorRunTime
          a.cpu += m.executorCpuTime / 1000000L
          a.gc += m.jvmGCTime
        }
      }
    })
    def once(label: String): Unit = {
      stages.clear()
      val t0 = System.nanoTime()
      val n = graft.ext.Dedup.sourceSimilarity(
        Tables.documents(spark, dir), "source", "doc_id", "text", n = 3, perms = 16).count()
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[cssprobe] $label rows=$n wall=$w%.1f s cores=${Sessions.cpus}")
      stages.toSeq.sortBy(-_._2.wall).take(6).foreach { case (id, a) =>
        println(f"[cssprobe]   stage $id%4d wall=${a.wall / 1000.0}%6.2f s tasks=${a.n}%4d " +
          f"runSum=${a.run / 1000.0}%7.1f cpuSum=${a.cpu / 1000.0}%7.1f gcSum=${a.gc / 1000.0}%6.1f  ${a.name}")
      }
      spark.catalog.clearCache()
    }
    once("run1")
    once("run2")
    once("run3")
    spark.stop()
  }
}
