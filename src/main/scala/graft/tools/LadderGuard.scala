package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** Superlinear-growth guard over a scale ladder — the "fail loudly" half
  * of the [[ScaleProbe]] protocol. Each rung of the ladder is one
  * ScaleProbe JSON line (separate JVM per rung, cold shuffles); this tool
  * merges them into the committed `BENCH_scale_ladder.json` shape AND
  * `require`s that no query grew faster than a declared bound between
  * consecutive rungs. A regression like round 9's `q_text_pmi` (25× wall
  * for 10× data at the sf10 rung) then fails the run instead of waiting
  * for a human to read the JSON.
  *
  * Usage: `LadderGuard [--exclude <sfDirSubstr>:<q1,q2,…>]...
  * [--host-cpu-floor <cores>] <bound> <out.json> <rung1.json>
  * <rung2.json> [...]` — `bound` is the max allowed wall-time ratio
  * between consecutive rungs (rungs are 10× data steps by protocol, so a
  * bound of 12 means "at most mildly superlinear"). Exit 1 + the
  * violation list on stderr when any query crosses it. Rung files
  * carrying per-query `vitals` (ScaleProbe emits them) get the
  * [[hostExclusions]] pass first: a bound violation whose own vitals show
  * the JVM was not being scheduled (process cpu under the floor per
  * wall-second) is moved to `excluded` automatically, with the evidence
  * on stderr and in the artifact.
  *
  * `--exclude` moves a query's measurement at the matching rung(s) from
  * the guarded `queries` map into the stage's `excluded` map: MEASURED,
  * CARRIED IN THE COMMITTED ARTIFACT, but exempt from the bound — the
  * protocol's escape hatch for rungs whose absolutes are known
  * host-poisoned (the r12 sf100 forensics) without silently dropping them
  * from the JSON. A reader of the artifact alone sees exactly which
  * queries were attempted-but-unguarded at each rung; every exclusion is
  * also announced on stderr with its would-have-been step ratio.
  *
  * Noise floor: a ratio over a sub-second base measures constants, not a
  * plan — at 32 local threads a sub-1 s rung time is scheduler dispatch +
  * scan setup + first-task skew, and a 10× step from that base charges
  * those constants to "growth" (measured: `q_sample_hash` 0.46 s at sf10 →
  * 8.0 s at sf100 reads as 17× while its work — one hash-filter scan over
  * 600M rows — is plainly linear; the 8 s IS the linear number, the 0.46 s
  * base is below what this harness can attribute). So bases are floored at
  * 1 s and rung times under 1 s are never violations regardless of ratio.
  * The floor only loosens sub-second-base steps; any query whose smaller
  * rung already takes ≥1 s is judged on its true ratio — and every step
  * the floor actually FORGAVE (un-floored ratio over the bound, floored
  * ratio under it) is printed as a `[guard-exempt]` line, so the
  * loosening stays visible per-step instead of silently widening the
  * regression window.
  */
object LadderGuard {

  /** Minimum base (smaller-rung seconds) a growth ratio is computed
    * against; see the noise-floor scaladoc above.
    */
  val NoiseFloorSec = 1.0

  /** `missing` = queries the probe ATTEMPTED at this rung whose child JVM
    * died (OOM, disk-full, killed) — ScaleProbe emits them so a partial
    * rung is machine-readable; the guard carries them into the committed
    * ladder JSON (a reader of the artifact must not need the bench notes
    * to learn a rung is partial). `excluded` = queries MEASURED at this
    * rung but exempted from the growth bound (`--exclude`) — carried in
    * the artifact for the same reason.
    */
  final case class Rung(
      sfDir: String,
      totalSec: Double,
      queries: Seq[(String, Double)],
      missing: Seq[String] = Seq.empty,
      excluded: Seq[(String, Double)] = Seq.empty,
      // per-query vitals JSON (the ScaleProbe/Bench snapshot: process-cpu
      // seconds, gc ms, heap/storage MB, codegen count, load) — carried
      // verbatim into the committed ladder so every rung row can be
      // host-vs-engine adjudicated from the artifact alone
      vitals: Map[String, String] = Map.empty)

  /** Move each rung's `--exclude`-matched measurements from the guarded
    * `queries` into `excluded`. A rung matches a directive when its sfDir
    * CONTAINS the directive's substring (rung dirs are paths like
    * `/tmp/graft-sf100`; the directive says `sf100`). Unmatched query
    * names are ignored — the directive may name queries a partial rung
    * never completed.
    */
  def applyExclusions(rungs: Seq[Rung], directives: Seq[(String, Set[String])]): Seq[Rung] =
    rungs.map { r =>
      val names = directives.collect {
        case (dirSubstr, qs) if r.sfDir.contains(dirSubstr) => qs
      }.flatten.toSet
      if (names.isEmpty) r
      else {
        val (out, kept) = r.queries.partition { case (q, _) => names.contains(q) }
        r.copy(queries = kept, excluded = r.excluded ++ out)
      }
    }

  /** Default [[hostExclusions]] floor: a timed window in which the process
    * accumulated less than half a core-second per wall-second on a 32-thread
    * local runner means the kernel was NOT scheduling this JVM — the r13/r14
    * sys-spin pathology signature (92-93% system time, 34 runnable, process
    * cpu near zero), never a healthy plan: even the most spill-bound query
    * measured on this box sustains >1 core of process cpu. Tunable via
    * `--host-cpu-floor` (0 disables) because the right floor is
    * host-specific; the vitals stay in the artifact either way, so a
    * disabled or mis-set floor still leaves the evidence for a human.
    */
  val DefaultHostCpuFloor = 0.5

  /** Move bound-violating measurements whose OWN vitals prove the host was
    * not scheduling the JVM (process cpu/wall under `cpuFloor`) from
    * `queries` into `excluded` — the automated form of the bench-notes
    * "measured on a poisoned host" adjudication, driven by in-artifact
    * evidence instead of live vmstat + prose. Deliberately NARROW: only
    * measurements that would otherwise FAIL the guard are touched (a
    * passing row is never excluded), and only when vitals exist for the
    * query; a violation with healthy cpu stays a violation. Returns the
    * adjusted rungs plus one stderr line per exclusion.
    */
  def hostExclusions(
      rungs: Seq[Rung], bound: Double, cpuFloor: Double): (Seq[Rung], Seq[String]) = {
    if (cpuFloor <= 0.0) return (rungs, Seq.empty)
    val mapper = new ObjectMapper()
    val notes = scala.collection.mutable.ArrayBuffer.empty[String]
    val adjusted = rungs.zipWithIndex.map { case (r, i) =>
      if (i == 0) r
      else {
        val base = rungs(i - 1).queries.toMap
        val (out, kept) = r.queries.partition { case (q, t) =>
          val violates = base.contains(q) && t >= 1.0 &&
            t / math.max(base(q), NoiseFloorSec) > bound
          violates && r.vitals.get(q).exists { v =>
            try {
              val n = mapper.readTree(v)
              n.has("cpu") && n.get("cpu").asDouble() / t < cpuFloor
            } catch { case scala.util.control.NonFatal(_) => false }
          }
        }
        out.foreach { case (q, t) =>
          val cpu = try mapper.readTree(r.vitals(q)).path("cpu").asDouble()
            catch { case scala.util.control.NonFatal(_) => Double.NaN }
          notes += f"$q: HOST-EXCLUDED at ${r.sfDir} ($t%.2f s wall, $cpu%.1f cpu-s = ${cpu / t}%.2f cores; " +
            f"step ${t / math.max(base(q), NoiseFloorSec)}%.1fx > bound — vitals say the host was not scheduling the JVM)"
        }
        if (out.isEmpty) r else r.copy(queries = kept, excluded = r.excluded ++ out)
      }
    }
    (adjusted, notes.toSeq)
  }

  /** Violation lines for every consecutive-rung query growth above `bound`. */
  def violations(rungs: Seq[Rung], bound: Double): Seq[String] = {
    require(bound > 1.0, s"bound must be > 1, got $bound")
    rungs.iterator.sliding(2).withPartial(false).flatMap { case Seq(a, b) =>
      val base = a.queries.toMap
      b.queries.collect {
        case (q, t) if base.contains(q) && t >= 1.0 &&
            t / math.max(base(q), NoiseFloorSec) > bound =>
          f"$q: ${a.sfDir} ${base(q)}%.2f s -> ${b.sfDir} $t%.2f s = " +
            f"${t / math.max(base(q), NoiseFloorSec)}%.1fx > bound ${bound}%.1fx"
      }
    }.toSeq
  }

  /** The guard's blind spots, made visible: queries present in a rung but
    * absent from its neighbor (no base to ratio against, or no growth
    * measurement at the step — e.g. a rung-specific subset or a lost
    * child), `--exclude`d measurements (deliberately unguarded, printed
    * with the step ratio the guard would have judged), and floored-base
    * steps the noise floor FORGAVE (un-floored ratio over the bound).
    * None of these can fail the run, so all must at least reach stderr.
    */
  def exemptions(rungs: Seq[Rung], bound: Double): Seq[String] =
    rungs.iterator.sliding(2).withPartial(false).flatMap { case Seq(a, b) =>
      val base = a.queries.toMap
      val baseAll = (a.queries ++ a.excluded).toMap
      val nextAll = (b.queries ++ b.excluded).toMap.keySet
      // a-not-in-b: measured at the smaller rung but never at the larger
      // one (rung-specific subset, or a child the probe lost) — those
      // queries have NO growth measurement at this step, which the guard
      // cannot fail on, so it must at least be said out loud.
      val unmeasured = a.queries.collect {
        case (q, t) if !nextAll.contains(q) =>
          f"$q: in rung ${a.sfDir} ($t%.2f s) but absent from ${b.sfDir} — no growth measurement at this step"
      }
      val unguarded = b.queries.flatMap {
        case (q, t) if !baseAll.contains(q) =>
          Some(f"$q: in rung ${b.sfDir} ($t%.2f s) but absent from ${a.sfDir} — growth unguarded")
        case _ => None
      }
      val excludedLines = b.excluded.map { case (q, t) =>
        baseAll.get(q) match {
          case Some(prev) =>
            f"$q: EXCLUDED from guard at ${b.sfDir} ($t%.2f s; step ratio ${t / math.max(prev, NoiseFloorSec)}%.1fx vs ${a.sfDir})"
          case None =>
            f"$q: EXCLUDED from guard at ${b.sfDir} ($t%.2f s; no base at ${a.sfDir})"
        }
      }
      // the floor's forgiveness, per step: a sub-floor base whose TRUE
      // ratio crosses the bound while the floored ratio passes
      val floored = b.queries.collect {
        case (q, t) if base.contains(q) && t >= 1.0 &&
            base(q) > 0.0 && base(q) < NoiseFloorSec &&
            t / base(q) > bound && t / NoiseFloorSec <= bound =>
          f"$q: floored-base step at ${b.sfDir} — un-floored ${t / base(q)}%.1fx exceeds bound ${bound}%.1fx (base ${base(q)}%.2f s < $NoiseFloorSec%.1f s floor, floored ${t / NoiseFloorSec}%.1fx passes)"
      }
      unmeasured ++ unguarded ++ excludedLines ++ floored
    }.toSeq

  def parseRung(json: String): Rung = {
    val node = new ObjectMapper().readTree(json)
    require(node.has("queries") && node.has("sf") && node.has("value"),
      "not a ScaleProbe line: missing 'queries'/'sf'/'value'")
    val qs = node.get("queries").properties().asScala.toSeq
      .map(e => e.getKey -> e.getValue.asDouble())
    val missing =
      if (!node.has("missing")) Seq.empty[String]
      else node.get("missing").elements().asScala.map(_.asText()).toSeq
    val excluded =
      if (!node.has("excluded")) Seq.empty[(String, Double)]
      else node.get("excluded").properties().asScala.toSeq
        .map(e => e.getKey -> e.getValue.asDouble())
    val vitals =
      if (!node.has("vitals")) Map.empty[String, String]
      else node.get("vitals").properties().asScala
        .map(e => e.getKey -> e.getValue.toString).toMap
    Rung(node.get("sf").asText(), node.get("value").asDouble(), qs, missing, excluded, vitals)
  }

  def ladderJson(rungs: Seq[Rung], bound: Double): String = {
    def qmap(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => s"${Jsons.str(k)}:$v" }.mkString("{", ",", "}")
    def stage(r: Rung): String = {
      val miss =
        if (r.missing.isEmpty) ""
        else s""","missing":${r.missing.map(Jsons.str).mkString("[", ",", "]")}"""
      val excl =
        if (r.excluded.isEmpty) ""
        else s""","excluded":${qmap(r.excluded)}"""
      val vits =
        if (r.vitals.isEmpty) ""
        else s""","vitals":${r.vitals.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${Jsons.str(k)}:$v" }.mkString("{", ",", "}")}"""
      s"""{"sf_dir":${Jsons.str(r.sfDir)},"total_sec":${r.totalSec},"queries":${qmap(r.queries)}$miss$excl$vits}"""
    }
    s"""{"metric":"scale_ladder","unit":"sec","protocol":"ScaleProbe per rung (fresh JVM, cold shuffles) + LadderGuard bound ${bound}x per 10x step; 'excluded' = measured but exempt from the bound, 'missing' = attempted but lost","stages":[${rungs.map(stage).mkString(",")}]}"""
  }

  def main(args: Array[String]): Unit = {
    val usage = "usage: LadderGuard [--exclude <sfDirSubstr>:<q1,q2,...>]... " +
      "[--host-cpu-floor <cores>] <bound> <out.json> <rung1.json> <rung2.json> [...]"
    var rest = args.toSeq
    val directives = scala.collection.mutable.ArrayBuffer.empty[(String, Set[String])]
    var hostCpuFloor = DefaultHostCpuFloor
    while (rest.headOption.exists(_.startsWith("--"))) {
      rest.head match {
        case "--exclude" =>
          require(rest.size >= 2, usage)
          val spec = rest(1)
          val i = spec.indexOf(':')
          require(i > 0 && i < spec.length - 1,
            s"--exclude wants <sfDirSubstr>:<q1,q2,...>, got: $spec")
          directives += spec.substring(0, i) ->
            spec.substring(i + 1).split(",").map(_.trim).filter(_.nonEmpty).toSet
          rest = rest.drop(2)
        case "--host-cpu-floor" =>
          require(rest.size >= 2, usage)
          hostCpuFloor = rest(1).toDouble
          rest = rest.drop(2)
        case other =>
          System.err.println(s"unknown flag: $other\n$usage")
          sys.exit(2)
      }
    }
    require(rest.size >= 4, usage)
    val bound = rest(0).toDouble
    val out = rest(1)
    val parsed = rest.drop(2).map { f =>
      val lines = scala.io.Source.fromFile(f).getLines().toSeq
      val probe = lines.filter(_.contains("\"metric\":\"scale_probe\""))
      require(probe.nonEmpty, s"$f: no scale_probe JSON line")
      parseRung(probe.last)
    }
    val manual = applyExclusions(parsed, directives.toSeq)
    val (rungs, hostNotes) = hostExclusions(manual, bound, hostCpuFloor)
    hostNotes.foreach(n => System.err.println("  [guard-host-excluded] " + n))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out), ladderJson(rungs, bound))
    exemptions(rungs, bound).foreach(e => System.err.println("  [guard-exempt] " + e))
    val bad = violations(rungs, bound)
    if (bad.nonEmpty) {
      System.err.println(s"LADDER GUARD FAILED (${bad.size} violations):")
      bad.foreach(v => System.err.println("  " + v))
      sys.exit(1)
    }
    println(s"ladder ok: ${rungs.size} rungs, bound ${bound}x, written to $out")
  }
}
