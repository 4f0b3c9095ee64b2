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
  * Usage: `LadderGuard <bound> <out.json> <rung1.json> <rung2.json> [...]`
  * — `bound` is the max allowed wall-time ratio between consecutive rungs
  * (rungs are 10× data steps by protocol, so a bound of 12 means "at most
  * mildly superlinear"). Exit 1 + the violation list on stderr when any
  * query crosses it.
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
  * rung already takes ≥1 s is judged on its true ratio.
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
    * to learn a rung is partial).
    */
  final case class Rung(
      sfDir: String,
      totalSec: Double,
      queries: Seq[(String, Double)],
      missing: Seq[String] = Seq.empty)

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
    * child). Neither can fail the run, so both must at least reach stderr.
    * (The old sub-1 s exemption line is gone by construction: with bases
    * floored at 1 s, a rung time under 1 s can never reach a bound > 1.)
    */
  def exemptions(rungs: Seq[Rung], bound: Double): Seq[String] =
    rungs.iterator.sliding(2).withPartial(false).flatMap { case Seq(a, b) =>
      val base = a.queries.toMap
      val next = b.queries.toMap
      // a-not-in-b: measured at the smaller rung but never at the larger
      // one (rung-specific subset, or a child the probe lost) — those
      // queries have NO growth measurement at this step, which the guard
      // cannot fail on, so it must at least be said out loud.
      val unmeasured = a.queries.collect {
        case (q, t) if !next.contains(q) =>
          f"$q: in rung ${a.sfDir} ($t%.2f s) but absent from ${b.sfDir} — no growth measurement at this step"
      }
      unmeasured ++ b.queries.flatMap {
        case (q, t) if !base.contains(q) =>
          Some(f"$q: in rung ${b.sfDir} ($t%.2f s) but absent from ${a.sfDir} — growth unguarded")
        case _ => None
      }
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
    Rung(node.get("sf").asText(), node.get("value").asDouble(), qs, missing)
  }

  def ladderJson(rungs: Seq[Rung], bound: Double): String = {
    def stage(r: Rung): String = {
      val qs = r.queries.map { case (k, v) => s"${Jsons.str(k)}:$v" }.mkString(",")
      val miss =
        if (r.missing.isEmpty) ""
        else s""","missing":${r.missing.map(Jsons.str).mkString("[", ",", "]")}"""
      s"""{"sf_dir":${Jsons.str(r.sfDir)},"total_sec":${r.totalSec},"queries":{$qs}$miss}"""
    }
    s"""{"metric":"scale_ladder","unit":"sec","protocol":"ScaleProbe per rung (fresh JVM, cold shuffles) + LadderGuard bound ${bound}x per 10x step","stages":[${rungs.map(stage).mkString(",")}]}"""
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: LadderGuard <bound> <out.json> <rung1.json> <rung2.json> [...]")
    val bound = args(0).toDouble
    val out = args(1)
    val rungs = args.drop(2).toSeq.map { f =>
      val lines = scala.io.Source.fromFile(f).getLines().toSeq
      val probe = lines.filter(_.contains("\"metric\":\"scale_probe\""))
      require(probe.nonEmpty, s"$f: no scale_probe JSON line")
      parseRung(probe.last)
    }
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
