package graft

/** Dev tool: run one named query with timing, optionally print the
  * formatted physical plan. Usage:
  *   runMain graft.Explain <query> <sfDir> [plan]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.get("explain")
    val df = SparkEntry.queries(name)(spark, dir)
    if (args.contains("plan")) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[explain] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
