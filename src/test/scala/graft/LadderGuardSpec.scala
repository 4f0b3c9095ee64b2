package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.LadderGuard
import graft.tools.LadderGuard.Rung

/** The guard must actually guard: a crafted superlinear rung FAILS, benign
  * growth and noise-floor cases pass. */
class LadderGuardSpec extends AnyFunSuite {

  private val sf1 = Rung("/sf1", 10.0,
    Seq("q_fast" -> 0.05, "q_lin" -> 2.0, "q_bad" -> 3.0))

  test("deliberately superlinear growth is a violation") {
    val sf10 = Rung("/sf10", 120.0,
      Seq("q_fast" -> 0.4, "q_lin" -> 16.0, "q_bad" -> 80.0))
    val v = LadderGuard.violations(Seq(sf1, sf10), bound = 12.0)
    assert(v.size == 1 && v.head.startsWith("q_bad:"), v.mkString("; "))
    assert(v.head.contains("26.7x"), v.head)
  }

  test("sub-second rung times are noise, never violations") {
    // 0.05 s -> 0.9 s is 18x by division but both are scheduler noise
    val sf10 = Rung("/sf10", 10.0, Seq("q_fast" -> 0.9, "q_lin" -> 15.0))
    assert(LadderGuard.violations(Seq(sf1, sf10), 12.0).isEmpty)
  }

  test("sub-second bases are floored: 0.05 s -> 3 s is 3x, not 60x") {
    val sf10 = Rung("/sf10", 10.0, Seq("q_fast" -> 3.0))
    assert(LadderGuard.violations(Seq(sf1, sf10), 12.0).isEmpty)
    assert(LadderGuard.violations(Seq(sf1, sf10), 2.5).nonEmpty)
    assert(LadderGuard.violations(Seq(sf1, sf10), 3.5).isEmpty)
  }

  test("a >=1 s base is judged on its true ratio, not the floor") {
    // base 1.2 s -> 16 s is 13.3x: over a 12x bound even though a 1.0 s
    // floor would read it as 16/1.0 = 16x and a pre-floor read as 13.3x —
    // the floor must not LOWER a real base
    val base = Rung("/sf1", 1.2, Seq("q_real" -> 1.2))
    val next = Rung("/sf10", 16.0, Seq("q_real" -> 16.0))
    assert(LadderGuard.violations(Seq(base, next), 12.0).nonEmpty)
    assert(LadderGuard.violations(Seq(base, next), 14.0).isEmpty)
  }

  test("three rungs check consecutive pairs independently") {
    val sf10 = Rung("/sf10", 10.0, Seq("q_lin" -> 20.0))
    val sf100 = Rung("/sf100", 10.0, Seq("q_lin" -> 600.0))
    val v = LadderGuard.violations(Seq(sf1, sf10, sf100), 12.0)
    assert(v.size == 1 && v.head.contains("/sf10") && v.head.contains("/sf100"))
  }

  test("exemptions surface the guard's blind spots: rung-only queries in either direction") {
    val sf10 = Rung("/sf10", 10.0,
      Seq("q_fast" -> 0.9, "q_lin" -> 15.0, "q_new" -> 200.0))
    val ex = LadderGuard.exemptions(Seq(sf1, sf10), 2.0)
    // q_new is absent from sf1 so its growth is unguarded; q_bad is
    // measured at sf1 but never at sf10 — no growth measurement. q_fast
    // (0.05 -> 0.9) is NOT a line: with bases floored at 1 s a sub-1 s
    // rung time cannot reach any bound, so there is nothing to exempt.
    assert(ex.exists(e => e.startsWith("q_new:") && e.contains("unguarded")),
      ex.mkString("; "))
    assert(ex.exists(e => e.startsWith("q_bad:") && e.contains("no growth measurement")),
      ex.mkString("; "))
    assert(ex.size == 2, ex.mkString("; "))
  }

  test("a partial rung's missing list survives parse -> merge into the committed artifact") {
    val line = """{"metric":"scale_probe","unit":"sec","value":5.5,""" +
      """"queries":{"q_a":1.25},"sf":"/sf100","n_queries":1,""" +
      """"missing":["q_compare_row_lvl","q_compare_overall"],"isolated":true}"""
    val r = LadderGuard.parseRung(line)
    assert(r.missing == Seq("q_compare_row_lvl", "q_compare_overall"))
    val merged = LadderGuard.ladderJson(Seq(r), 12.0)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(merged)
    val stage = node.get("stages").get(0)
    assert(stage.has("missing"), merged)
    assert(stage.get("missing").size() == 2)
    assert(stage.get("missing").get(0).asText() == "q_compare_row_lvl")
    // a complete rung carries NO missing key — absence means complete
    val full = LadderGuard.ladderJson(Seq(r.copy(missing = Seq.empty)), 12.0)
    val fullNode = new com.fasterxml.jackson.databind.ObjectMapper().readTree(full)
    assert(!fullNode.get("stages").get(0).has("missing"), full)
  }

  test("excluded measurements are carried in the artifact, exempt from the bound, announced") {
    val sf10 = Rung("/tmp/graft-sf10", 10.0, Seq("q_lin" -> 20.0, "q_heavy" -> 30.0))
    val sf100 = Rung("/tmp/graft-sf100", 700.0,
      Seq("q_lin" -> 190.0, "q_heavy" -> 600.0))
    // host-poisoned sf100 absolute: 600/30 = 20x would fail the 12x bound
    assert(LadderGuard.violations(Seq(sf10, sf100), 12.0).nonEmpty)
    val excluded = LadderGuard.applyExclusions(
      Seq(sf10, sf100), Seq("sf100" -> Set("q_heavy", "q_never_ran")))
    // exclusion hits only the matching rung, ignores unknown names
    assert(excluded.head.excluded.isEmpty && excluded.head.queries.size == 2)
    assert(excluded(1).queries == Seq("q_lin" -> 190.0))
    assert(excluded(1).excluded == Seq("q_heavy" -> 600.0))
    // the guarded bound passes once the poisoned row is exempt…
    assert(LadderGuard.violations(excluded, 12.0).isEmpty)
    // …but the measurement is announced with its would-have-been ratio…
    val ex = LadderGuard.exemptions(excluded, 12.0)
    assert(ex.exists(e => e.startsWith("q_heavy:") && e.contains("EXCLUDED")
      && e.contains("20.0x")), ex.mkString("; "))
    // …and is NOT double-reported as an unmeasured/unguarded blind spot
    assert(!ex.exists(e => e.contains("no growth measurement")), ex.mkString("; "))
    // …and the committed JSON is self-describing
    val merged = LadderGuard.ladderJson(excluded, 12.0)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(merged)
    val stage = node.get("stages").get(1)
    assert(stage.get("excluded").get("q_heavy").asDouble() == 600.0, merged)
    assert(!stage.get("queries").has("q_heavy"), merged)
    assert(!node.get("stages").get(0).has("excluded"), merged)
    // …and round-trips through parseRung
    val rt = LadderGuard.parseRung(
      """{"metric":"scale_probe","unit":"sec","value":700.0,""" +
        """"queries":{"q_lin":190.0},"excluded":{"q_heavy":600.0},"sf":"/tmp/graft-sf100"}""")
    assert(rt.excluded == Seq("q_heavy" -> 600.0))
  }

  test("floored-base steps whose un-floored ratio exceeds the bound reach stderr exemptions") {
    // base 0.4 s -> 11 s: floored reads 11x (passes a 12x bound) but the
    // true ratio is 27.5x — the forgiveness must be visible per-step
    val a = Rung("/sf1", 1.0, Seq("q_f" -> 0.4, "q_ok" -> 0.9))
    val b = Rung("/sf10", 20.0, Seq("q_f" -> 11.0, "q_ok" -> 8.0))
    assert(LadderGuard.violations(Seq(a, b), 12.0).isEmpty)
    val ex = LadderGuard.exemptions(Seq(a, b), 12.0)
    assert(ex.exists(e => e.startsWith("q_f:") && e.contains("floored-base")
      && e.contains("27.5x")), ex.mkString("; "))
    // q_ok's un-floored 8.9x is under the bound — no line
    assert(!ex.exists(_.startsWith("q_ok:")), ex.mkString("; "))
  }

  test("parseRung rejects a line missing 'value' with the diagnostic message, not an NPE") {
    val bad = """{"metric":"scale_probe","queries":{"q_a":1.0},"sf":"/tmp/x"}"""
    val e = intercept[IllegalArgumentException](LadderGuard.parseRung(bad))
    assert(e.getMessage.contains("value"), e.getMessage)
  }

  test("ladderJson escapes quotes/backslashes in sfDir and query names") {
    val r = Rung("""/tmp/we"ird\dir""", 1.0, Seq("""q_"x""" -> 1.0))
    val merged = LadderGuard.ladderJson(Seq(r), 12.0)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(merged)
    assert(node.get("stages").get(0).get("sf_dir").asText() == """/tmp/we"ird\dir""")
    assert(node.get("stages").get(0).get("queries").has("""q_"x"""))
  }

  test("parseRung reads a ScaleProbe line; ladderJson round-trips") {
    val line = """{"metric":"scale_probe","unit":"sec","value":5.5,""" +
      """"queries":{"q_a":1.25,"q_b":4.25},"sf":"/tmp/x","n_queries":2}"""
    val r = LadderGuard.parseRung(line)
    assert(r.sfDir == "/tmp/x" && r.totalSec == 5.5 &&
      r.queries == Seq("q_a" -> 1.25, "q_b" -> 4.25))
    val merged = LadderGuard.ladderJson(Seq(r), 12.0)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(merged)
    assert(node.get("stages").size() == 1)
    assert(node.get("stages").get(0).get("queries").get("q_b").asDouble() == 4.25)
  }

  test("vitals survive parse -> merge into the committed ladder") {
    val line = """{"metric":"scale_probe","unit":"sec","value":5.5,""" +
      """"queries":{"q_a":5.5},""" +
      """"vitals":{"q_a":{"cpu":42.10,"gc_ms":7,"heap_mb":900,"store_mb":120,"cg_n":55,"load":3.1}},""" +
      """"sf":"/tmp/x","n_queries":1}"""
    val r = LadderGuard.parseRung(line)
    assert(r.vitals.contains("q_a"), r.vitals)
    val merged = LadderGuard.ladderJson(Seq(r), 12.0)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(merged)
    val stage = node.get("stages").get(0)
    assert(stage.has("vitals"), merged)
    assert(stage.get("vitals").get("q_a").get("cpu").asDouble() == 42.10)
    // a vitals-free rung carries no vitals key — old rung files still merge
    val bare = LadderGuard.ladderJson(Seq(r.copy(vitals = Map.empty)), 12.0)
    assert(!new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(bare).get("stages").get(0).has("vitals"))
  }

  test("host-cpu exclusion fires ONLY on bound violations whose vitals show a starved JVM") {
    def vit(cpu: Double) =
      s"""{"cpu":$cpu,"gc_ms":10,"heap_mb":900,"store_mb":100,"cg_n":50,"load":30.0}"""
    val base = Rung("/sf10", 30.0,
      Seq("q_starved" -> 10.0, "q_real" -> 10.0, "q_ok" -> 10.0))
    val next = Rung("/sf100", 600.0,
      // q_starved: 20x step, 5 cpu-s over 200 s wall = 0.025 cores -> host
      // q_real:    20x step, 400 cpu-s over 200 s = 2 cores -> genuine violation
      // q_ok:      8x step under the bound, ALSO starved-looking -> untouched
      Seq("q_starved" -> 200.0, "q_real" -> 200.0, "q_ok" -> 80.0),
      vitals = Map("q_starved" -> vit(5.0), "q_real" -> vit(400.0), "q_ok" -> vit(1.0)))
    val (adj, notes) = LadderGuard.hostExclusions(Seq(base, next), 12.0, 0.5)
    assert(notes.size == 1 && notes.head.startsWith("q_starved:"), notes.mkString("; "))
    assert(adj(1).excluded.map(_._1) == Seq("q_starved"))
    assert(adj(1).queries.map(_._1).toSet == Set("q_real", "q_ok"))
    // the genuine violation still fails the guard after the host pass
    assert(LadderGuard.violations(adj, 12.0).exists(_.startsWith("q_real:")))
    // floor 0 disables the pass entirely
    val (off, none) = LadderGuard.hostExclusions(Seq(base, next), 12.0, 0.0)
    assert(none.isEmpty && off(1).excluded.isEmpty)
    // a violation WITHOUT vitals is never auto-excused
    val blind = next.copy(vitals = Map.empty)
    val (adj2, notes2) = LadderGuard.hostExclusions(Seq(base, blind), 12.0, 0.5)
    assert(notes2.isEmpty && adj2(1).excluded.isEmpty)
  }
}
