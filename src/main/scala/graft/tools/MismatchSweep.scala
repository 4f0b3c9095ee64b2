package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.config.DatasetParams

/** Mismatch-RATE sensitivity cell for the compare engine's refetch prune.
  *
  * The engine's second (mismatch-only) job prunes the full-width sides to
  * the mismatched keys by either a broadcast semi join (exact; driver
  * ships a key hash table) or a Bloom-pruned semi join (scan-side filter;
  * ~1.2 bytes/key), cutting over at
  * [[graft.core.Comparison.BroadcastMismatchKeysMaxConf]] (default 4M
  * keys — raised from 1M by this tool's own r14 sweep, where forced
  * broadcast still beat Bloom 1.4× at 1.5M keys). The ladder exercises
  * only ~0% and ~28% mismatch scenarios, so the cutover's neighborhood
  * was never measured before that sweep — this tool runs ONE
  * (rate, prune-mode) cell so a shell driver can sweep rates across the
  * boundary with BOTH branches forced at every rate, ladder-style (one
  * fresh JVM per cell).
  *
  * Scenario: source = orders as-is; target = orders with `o_totalprice`
  * shifted by 1.0 on keys where `o_orderkey % denom == 0` — a pure value
  * mismatch at rate 1/denom, no missing rows, no duplicates, so the
  * measured work is exactly checksum scan + slim join + refetch of
  * |keys|/denom keys + tolerance pass.
  *
  * Usage: `MismatchSweep <sfDir> <denom> <auto|broadcast|bloom>
  * [simple|composite]` — prints one JSON line with wall seconds, the
  * mismatch-key count, and the mode. `composite` runs the identical
  * scenario with a 3-column primary key (o_orderkey, o_custkey,
  * o_orderstatus — still unique, since o_orderkey alone is): the r14
  * sweep that set the 4M cutover used single-long keys, and a composite
  * key multiplies the broadcast hash-relation's bytes/row, so the
  * cutover's memory arithmetic needs its own forced-branch measurement
  * at the boundary.
  */
object MismatchSweep {
  def main(args: Array[String]): Unit = {
    val (sfDir, denom, mode, keymode) = args match {
      case Array(d, dn, m) if Set("auto", "broadcast", "bloom")(m) =>
        (d, dn.toLong, m, "simple")
      case Array(d, dn, m, km) if Set("auto", "broadcast", "bloom")(m) &&
          Set("simple", "composite")(km) =>
        (d, dn.toLong, m, km)
      case _ =>
        System.err.println(
          "usage: MismatchSweep <sfDir> <denom> <auto|broadcast|bloom> [simple|composite]")
        sys.exit(2)
        throw new IllegalStateException
    }
    require(denom >= 2, s"denom must be >= 2, got $denom")
    if (sys.env.getOrElse("SPARK_GRAFT_PRETOUCH", "1") != "0") graft.Bench.preTouchHeap()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "broadcast" =>
        spark.conf.set(graft.core.Comparison.BroadcastMismatchKeysMaxConf, Long.MaxValue.toString)
      case "bloom" =>
        spark.conf.set(graft.core.Comparison.BroadcastMismatchKeysMaxConf, "0")
      case _ => () // auto: the production default cutover decides
    }

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val k = col("o_orderkey")
    val tgt = orders.withColumn(
      "o_totalprice",
      col("o_totalprice") + when(k % denom === 0, lit(1.0)).otherwise(lit(0.0)))
    val pks =
      if (keymode == "composite") Seq("o_orderkey", "o_custkey", "o_orderstatus")
      else Seq("o_orderkey")
    val t0 = System.nanoTime()
    val res = graft.core.Comparison.compareDataFrames(
      spark, orders, tgt, DatasetParams(s"sweep_$denom", pks))
    // consume the engine end-to-end the way the catalog rows do: the
    // eager stats jobs already ran inside compareDataFrames; the row-level
    // report is the one lazily-deferred consumer
    val rowN = res.rowLvlTestReport.queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val overall = res.overallTestReport.collect().head
    val matched = overall.getAs[Long]("matched_count")
    val total = overall.getAs[Map[String, Long]]("count")("source")
    res.unpersist()
    println(s"""{"metric":"mismatch_sweep","sec":$sec,"mode":${Jsons.str(mode)},""" +
      s""""keymode":${Jsons.str(keymode)},""" +
      s""""denom":$denom,"keys":$total,"mismatch_keys":${total - matched},""" +
      s""""row_lvl_rows":$rowN,"sf":${Jsons.str(sfDir)}}""")
    spark.stop()
  }
}
