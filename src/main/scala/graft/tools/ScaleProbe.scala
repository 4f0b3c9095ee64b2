package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling-sweep probe: time a NAMED SUBSET of the catalog at an arbitrary
  * scale directory — the tool behind multi-decade scaling ladders (sf0.1 →
  * sf1 → sf10) where running the FULL catalog would be dominated by the
  * handful of deliberately-brute-force demo rows (exact all-pairs
  * embedding near-dup, quadratic oracles) and the constant-cost streaming
  * replays, none of which say anything about how the scale-designed plans
  * grow.
  *
  * Usage: `ScaleProbe [--isolate] <sfDir> <q1,q2,…>` — Bench-comparable
  * protocol: a warm pass materializes ONE instance (pages faulted, codegen
  * JIT'd, catalog caches primed), then a FRESH instance of the same query
  * is timed. The fresh instance matters: re-counting the SAME DataFrame
  * skips every map stage whose shuffle files survive from the warm run,
  * which silently measures only the result stage (~6× too fast on shuffle
  * queries). One JSON line on stdout, carrying per-query `vitals` (the
  * [[graft.Bench.Vitals]] snapshot over exactly the timed window) so every
  * rung measurement is host-vs-engine adjudicable from the artifact alone —
  * [[LadderGuard]] reads them to auto-exclude host-starved violations.
  *
  * `--isolate` runs EVERY query in its own child JVM (same classpath,
  * same --add-opens/-Xmx, warm+timed inside the child) and merges the
  * children's JSON. This is the ladder-grade protocol: the in-JVM
  * sequence measurably contaminates later queries — the round-9 sf10 rung
  * recorded 86 s for a query that times at 4.5 s in a fresh JVM, and a
  * round-10 re-probe still saw 25 s vs 7 s standalone for
  * `q_profile_corr` even with the gc-between-queries hygiene — so
  * cross-query ratios are only trustworthy when no query inherits another
  * query's JVM. Cost: one Spark-session startup per query (~10 s),
  * irrelevant next to rung wall times.
  *
  * `--precache` (isolate mode only) re-reads every parquet file under
  * `sfDir` into the OS page cache before launching each child. Ladder
  * ratios are only meaningful when every rung sees the SAME input-I/O
  * state, and by construction the small rungs do: a 1.6 GB sf10 corpus
  * stays page-cached across its whole rung. A 16 GB sf100 corpus does
  * not — each big child's heap pre-touch plus its own spill writes evict
  * corpus pages, so whichever query first re-reads an evicted table is
  * charged cold I/O at whatever this box's disk does (measured 90 MB/s
  * virtio: an 11 GB lineitem re-read is 124 s, which showed up as
  * q_sketch_hll "growing" 56× per 10× step when its compute grew ~10×).
  * That is a single-disk box artifact, not plan growth — a cluster reads
  * 100 TB at aggregate TB/s from distributed storage — so the ladder
  * protocol equalizes cache state instead of letting the biggest rung
  * pay a penalty the small rungs structurally cannot see.
  */
object ScaleProbe {

  /** Best-effort recursive delete of a child's private scratch root. A
    * child that dies hard — executor OOM, disk-full abort — regularly
    * times out its own ShutdownHook and leaves tens of GB of spill
    * behind; at the sf100 rung that stranded scratch then starves every
    * LATER child of the same disk that killed its predecessor (observed:
    * a 26 GB pagerank orphan pushing the next child from 60 GB free to
    * 23). Best-effort by DESIGN: the walk itself can race the dying
    * child's own shutdown-hook cleanup (NoSuchFileException) or hit an
    * unreadable entry (UncheckedIOException) — neither may crash the
    * parent and vaporize the surviving measurements the sweep exists to
    * preserve, so everything is caught, logged, and skipped.
    */
  private def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      if (!java.nio.file.Files.exists(p)) return
      val s = java.nio.file.Files.walk(p)
      val all = try s.iterator().asScala.toSeq finally s.close()
      all.sortBy(-_.getNameCount)
        .foreach(f => try java.nio.file.Files.deleteIfExists(f) catch { case _: java.io.IOException => () })
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[scaleprobe] scratch sweep of $p skipped: $e")
    }

  /** Re-invoke this JVM's java on one (sfDir, query), return its JSON line.
    *
    * Scratch OWNERSHIP is structural, not diffed: each child gets its own
    * fresh `java.io.tmpdir` subdirectory (Spark derives spark.local.dir
    * from it, so all blockmgr- and spark- scratch lands inside), and the
    * parent deletes that one root wholesale after the child exits. A
    * concurrent Spark JVM on the same box — another probe rung, a
    * StreamBench child, an unrelated job — can never lose its live
    * shuffle dirs to this sweep, which the previous diff-the-shared-tmpdir
    * approach could not guarantee.
    */
  private def runChild(sfDir: String, name: String): Option[(Double, Option[String])] = {
    import scala.jdk.CollectionConverters._
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(a =>
        a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        a.startsWith("-Xmx") || a.startsWith("-Xms") || a.startsWith("-XX:"))
    val scratch = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir", "/tmp")),
      s"graft-probe-${name.replaceAll("[^A-Za-z0-9_.-]", "_")}-")
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq(
      s"-Djava.io.tmpdir=$scratch",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.ScaleProbe", sfDir, name)
    val pb = new ProcessBuilder(cmd.asJava)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val rc = p.waitFor()
    deleteRecursively(scratch)
    if (rc != 0) { System.err.println(s"[scaleprobe] child $name rc=$rc"); return None }
    // parse this query's seconds — and its vitals, when the child emitted
    // them — from the child's one-line JSON
    try {
      val line = out.linesIterator.find(_.contains("\"metric\":\"scale_probe\""))
      if (line.isEmpty) { System.err.println(s"[scaleprobe] child $name: no result in: $out"); return None }
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line.get)
      val q = node.path("queries").path(name)
      if (q.isMissingNode) { System.err.println(s"[scaleprobe] child $name: no result in: $out"); return None }
      val vit = node.path("vitals").path(name)
      Some((q.asDouble(), if (vit.isMissingNode) None else Some(vit.toString)))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[scaleprobe] child $name: unparseable output ($e): $out")
        None
    }
  }

  /** Fault every parquet byte under `dir` back into the OS page cache
    * (sequential read to a sink). Cheap when already cached (~1 s/10 GB of
    * page-cache hits); one cold pass at this box's disk speed otherwise —
    * paid BEFORE the child's clock starts, which is the point.
    */
  private[tools] def precacheParquet(dir: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.isDirectory(root)) return
      val s = java.nio.file.Files.walk(root)
      val files = try s.iterator().asScala.filter(p =>
        p.toString.endsWith(".parquet") && java.nio.file.Files.isRegularFile(p)).toSeq
      finally s.close()
      val buf = new Array[Byte](1 << 20)
      var bytes = 0L
      val t0 = System.nanoTime()
      files.foreach { p =>
        val in = java.nio.file.Files.newInputStream(p)
        try { var n = in.read(buf); while (n >= 0) { bytes += n; n = in.read(buf) } }
        finally in.close()
      }
      System.err.println(f"[scaleprobe] precached ${bytes / 1e9}%.1f GB in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[scaleprobe] precache of $dir skipped: $e")
    }

  def main(args: Array[String]): Unit = {
    val usage = "usage: ScaleProbe [--isolate] [--precache] <sfDir> <query1,query2,...>"
    def die(msg: String): Nothing = {
      System.err.println(s"$msg\n$usage")
      sys.exit(2)
      throw new IllegalStateException
    }
    // Validate the flag set strictly: a misspelled flag (--isolat) must
    // not silently fall through to driver-mode, and a flag-combination
    // error must print the usage line, not a raw require() stack.
    val flags = args.takeWhile(_.startsWith("--")).toSet
    val unknownFlags = flags.diff(Set("--isolate", "--precache"))
    if (unknownFlags.nonEmpty) die(s"unknown flag(s): ${unknownFlags.mkString(", ")}")
    val isolate = flags.contains("--isolate")
    val precache = flags.contains("--precache")
    if (precache && !isolate) die("--precache requires --isolate")
    val rest = args.dropWhile(_.startsWith("--"))
    val (sfDir, names) = rest match {
      case Array(d, qs) => (d, qs.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      case _ => die("expected exactly <sfDir> <query1,query2,...>")
    }
    if (isolate) {
      val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val vitals = scala.collection.mutable.LinkedHashMap.empty[String, String]
      names.foreach { n =>
        if (precache) precacheParquet(sfDir)
        runChild(sfDir, n).foreach { case (sec, vit) =>
          results += n -> sec
          vit.foreach(vitals += n -> _)
          System.err.println(f"[scaleprobe] $n%-26s $sec%8.2f s  (isolated)")
        }
      }
      // A lost child (OOM, disk-full, killed) must not vaporize the rung:
      // the surviving children's measurements are real and already paid
      // for. Emit the partial rung WITH the missing queries named — the
      // round-11 sf100 rung lost its two compare children to disk
      // exhaustion and the old require() here would have discarded the
      // six completed graph/dedup measurements with them. Exit nonzero so
      // a driving script still sees the failure.
      val missing = names.filterNot(results.contains)
      missing.foreach(q => System.err.println(s"[scaleprobe] MISSING: $q (child failed; see stderr above)"))
      val qs = results.map { case (k, v) => Jsons.str(k) + ":" + v }.mkString("{", ",", "}")
      val vs = vitals.map { case (k, v) => Jsons.str(k) + ":" + v }.mkString("{", ",", "}")
      val missJson = missing.map(Jsons.str).mkString("[", ",", "]")
      println(s"""{"metric":"scale_probe","unit":"sec","value":${results.values.sum},""" +
        s""""queries":$qs,"vitals":$vs,"sf":${Jsons.str(sfDir)},"n_queries":${results.size},""" +
        s""""missing":$missJson,"isolated":true}""")
      if (missing.nonEmpty) sys.exit(3)
      return
    }
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    if (sys.env.getOrElse("SPARK_GRAFT_PRETOUCH", "1") != "0") graft.Bench.preTouchHeap()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1200s")
      .config("spark.executor.heartbeat.maxFailures", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_WARM=0 skips the warm pass: at the sf100 rung a single
    // query runs hundreds of seconds, so the JIT/page-fault constants the
    // warm pass exists to amortize are <5% noise while the warm pass
    // itself DOUBLES the rung cost (and its shuffle/persist spill doubles
    // the peak disk footprint). Timed numbers stay a fresh-instance full
    // recompute either way — only the pre-touch differs.
    val warm = sys.env.getOrElse("SPARK_GRAFT_WARM", "1") != "0"
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // Per-query vitals over exactly the timed window — the same snapshot
    // the driver bench commits (graft.Bench.Vitals), so ladder rungs are
    // self-adjudicating: inflated wall + flat cpu/gc = the host was not
    // scheduling this JVM (LadderGuard reads these and host-excludes
    // automatically); growing heap/storage across a rung = engine state.
    val vitals = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val vt = new graft.Bench.Vitals(spark)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (warm) fn(spark, sfDir).queryExecution.toRdd.count() // warm (separate lineage)
      // The timed instance must not read ANY cross-instance cache: the
      // memoized comparison engine (a warm pass would otherwise turn
      // q_compare_* into a 0.07 s cache hit at sf10) or cached/checkpointed
      // frames. Scaling ratios are only meaningful on the full recompute.
      graft.Queries.clearComparisonCache()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      // collect the warm pass's garbage BEFORE starting the clock — a GC
      // triggered mid-measurement charges the previous instance's heap to
      // the timed one (observed as multi-second stalls in the sf10 ladder).
      System.gc()
      vt.reset()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      results += name -> (System.nanoTime() - t0) / 1e9
      vitals += name -> vt.snapshot()
      System.err.println(f"[scaleprobe] $name%-26s ${results(name)}%8.2f s  ($n rows)")
      // and release what the timed instance itself left behind, so query k
      // does not inherit query k-1's heap (the in-JVM accumulation that
      // inflated the sf10 ladder tail up to 10x).
      graft.Queries.clearComparisonCache()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    val qs = results.map { case (k, v) => Jsons.str(k) + ":" + v }.mkString("{", ",", "}")
    val vs = vitals.map { case (k, v) => Jsons.str(k) + ":" + v }.mkString("{", ",", "}")
    spark.stop()
    println(s"""{"metric":"scale_probe","unit":"sec","value":${results.values.sum},""" +
      s""""queries":$qs,"vitals":$vs,"sf":${Jsons.str(sfDir)},"n_queries":${results.size}}""")
  }
}
