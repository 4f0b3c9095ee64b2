ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
ThisBuild / organization := "graft"
name := "sparkdatatestspark"
// Library packaging: `sbt publishLocal` installs graft:sparkdatatestspark_2.13:0.1.0
// into the local ivy repository. Spark itself is intentionally absent from
// the POM (it comes from the unmanaged /opt/spark/jars here; a consumer
// declares their own spark-sql "provided" dependency, the standard shape
// for Spark libraries). Scaladoc generation is skipped — the jar is the
// deliverable and doc generation doubles publish time.
Compile / packageDoc / publishArtifact := false
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
// Heap sizing: honor SPARK_DRIVER_MEM but CAP it at 16 GiB. The driver
// exports a cluster-sized value (~96g — round-1 bench registered a
// 53.2 GiB block manager), but the sf0.1 suite runs comfortably in 8g,
// and on this host a big heap is a pure liability: the page-fault path
// is pathologically slow (~10 CPU-min/GiB), so pre-touching 90+ GiB
// costs tens of minutes of fixed overhead and a lazily-faulted tail
// stalls the driver long enough to trip the same-JVM executor's
// heartbeat monitor (round-2 bench died exactly this way: exit 56 =
// HEARTBEAT_FAILURE at minute 52). SPARK_GRAFT_HEAP overrides uncapped.
def heapMiB(s: String): Long = {
  val t = s.trim.toLowerCase
  val n = t.takeWhile(_.isDigit).toLong
  if (t.endsWith("g")) n * 1024 else if (t.endsWith("k")) n / 1024
  else if (t.endsWith("m")) n else n / (1024 * 1024)
}
val runHeap: String = sys.env.get("SPARK_GRAFT_HEAP").getOrElse {
  val m = heapMiB(sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
  s"${math.max(2048L, math.min(m, 16 * 1024L))}m"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$runHeap",
)
// Pin the heap for `run` (Bench/Verify): this host's page-fault path is
// pathologically slow, so GC commit/UNcommit churn on a lazily-sized heap
// costs minutes of kernel time mid-benchmark (observed 5-10x query
// inflation). -Xms=-Xmx prevents the shrink/regrow churn; the one-time
// first-touch fault cost is paid by Bench's own parallel pre-touch (bench
// only — Verify at sf0.01 doesn't need it and must start fast for the
// driver's timeout).
run / javaOptions += s"-Xms$runHeap"
// Forked `run` output must reach stdout VERBATIM: the driver parses the
// bench/verify JSON line from stdout, and sbt's default logger prefixes
// every forked line with "[info] ", which broke the round-1 parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// A bare `sbt run` must never open sbt's interactive main-class chooser
// (it blocks forever under a non-interactive driver). graft.Main
// dispatches: 2+ args -> Verify, none -> Bench.
Compile / run / mainClass := Some("graft.Main")
