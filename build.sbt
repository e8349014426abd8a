ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "potoosspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // dozens of codegen'd queries in one JVM overflow the default 240 MB
  // JIT code cache, after which generated code runs interpreted (measured
  // 3-10x slowdowns late in a Bench run)
  "-XX:ReservedCodeCacheSize=2g",
)

// ---- test sharding: 4 forked JVMs in parallel, local[8] each ----------
// One sequential JVM ran the suite past 45 min and grows ~2 min/round.
// Suites are independent (per-JVM SparkContext, per-JVM temp dirs and
// memory sinks), so they shard cleanly; each group gets a quarter of the
// cores via SPARK_GRAFT_CPUS (Sessions.cpus) so four JVMs don't
// oversubscribe the box 4x. Heaviest suites are pinned to their own
// groups; the rest spread by name hash for stability across rounds.
val testShards = 4
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val pinned = Map(
    "graft.ExtSpec" -> 0,
    "graft.StreamingSpec" -> 1,
    "graft.QueriesSpec" -> 2,
    "graft.DetectorsSpec" -> 3,
    "graft.TsAlgebraSpec" -> 3)
  val groups = tests.groupBy(t =>
    pinned.getOrElse(t.name, 2 + (math.abs(t.name.hashCode) % (testShards - 2))))
  groups.toSeq.sortBy(_._1).map { case (i, ts) =>
    Tests.Group(
      s"shard$i",
      ts,
      Tests.SubProcess(ForkOptions()
        .withRunJVMOptions(opts)
        .withEnvVars(Map("SPARK_GRAFT_CPUS" ->
          sys.env.getOrElse("SPARK_GRAFT_TEST_CPUS", "8")))))
  }
}
// sbt's default caps concurrently-running forked test groups at 1
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testShards),
  Tags.limitAll(math.max(testShards, java.lang.Runtime.getRuntime.availableProcessors())))
