package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for the k-core base-shrink lever: run the catalog's
  * `q_graph_kcore` shape (part co-occurrence edges, k = 80) with
  * `baseShrinkFraction` either disabled (`off`) or at the production
  * default (`on`), in THIS JVM — the caller launches one JVM per cell,
  * ladder-style, so the two shapes never share a process. Prints one JSON
  * line with wall seconds, peel rounds, and the core size (which must be
  * identical across shapes — the lever changes which cache the probes
  * scan, never results).
  *
  * Usage: `KcoreAB <sfDir> <on|off> [k] [maxRounds]` — when the first
  * argument ends in `.parquet` it is read directly as a (pa, pb) edge
  * list instead of deriving the catalog's co-occurrence edges, which is
  * how the deep-peel cells consume [[OnionGen]]'s output (the catalog
  * graph fixes in ~5 rounds; the lever's claim lives at hundreds).
  */
object KcoreAB {
  def main(args: Array[String]): Unit = {
    val (sfDir, mode, kArg, maxRoundsArg) = args match {
      case Array(d, m) if m == "on" || m == "off" => (d, m, 80, 50)
      case Array(d, m, kk) if m == "on" || m == "off" => (d, m, kk.toInt, 50)
      case Array(d, m, kk, mr) if m == "on" || m == "off" => (d, m, kk.toInt, mr.toInt)
      case _ =>
        System.err.println("usage: KcoreAB <sfDir|edges.parquet> <on|off> [k] [maxRounds]")
        sys.exit(2)
        throw new IllegalStateException
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PRETOUCH", "1") != "0") graft.Bench.preTouchHeap()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the exact q_graph_kcore input (Queries.partEdges): parts
    // co-occurring in an order via the distinct lineitem self-join — or a
    // pre-built (pa, pb) edge parquet for the deep-peel cells
    val edges =
      if (sfDir.endsWith(".parquet")) spark.read.parquet(sfDir)
      else graft.Queries.partEdges(spark, sfDir)
    val frac = if (mode == "on") 0.25 else 0.0
    val t0 = System.nanoTime()
    val (core, rounds, release) =
      graft.operators.Graphs.kCoreManaged(edges, "pa", "pb", k = kArg,
        maxRounds = maxRoundsArg, baseShrinkFraction = frac)
    val coreSize = core.count()
    val sec = (System.nanoTime() - t0) / 1e9
    release()
    println(s"""{"metric":"kcore_ab","mode":${Jsons.str(mode)},"sec":$sec,""" +
      s""""rounds":$rounds,"core_nodes":$coreSize,"sf":${Jsons.str(sfDir)}}""")
    spark.stop()
  }
}
