package graft.tools

import org.apache.spark.sql.SparkSession

/** Quick plan/latency profiler: runs one named query N times against a
  * scale-factor dir, printing per-iteration wall time and (optionally) the
  * formatted physical plan. Usage:
  * {{{
  *   Profile <queryName> <sfDir> [iters] [explain|clearcache]
  * }}}
  * `clearcache` drops the memoized comparison results between iterations,
  * so every iteration re-pays engine construction (the eager stats job) —
  * the number the bench actually measures — instead of a cache hit.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val iters = if (args.length > 2) args(2).toInt else 3
    val doExplain = args.length > 3 && args(3) == "explain"
    val clearCache = args.length > 3 && args(3) == "clearcache"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    (1 to iters).foreach { i =>
      if (clearCache) graft.Queries.clearComparisonCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      println(f"[profile] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
