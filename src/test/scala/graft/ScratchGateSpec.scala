package graft

import org.scalatest.funsuite.AnyFunSuite

/** The tmpfs scratch DEFAULT must be space-gated (r16): /dev/shm is
  * writable on every Linux box, but on a node whose tmpfs is small (or
  * full) shuffle files + streaming state on it would race the executor
  * heap for RAM. The gate admits a directory only with a real free-space
  * margin; the explicit `SPARK_GRAFT_SCRATCH` override bypasses it.
  */
class ScratchGateSpec extends AnyFunSuite {

  test("a writable directory with ample free space is eligible") {
    val tmp = java.nio.file.Files.createTempDirectory("scratch-gate")
    try assert(Bench.scratchEligible(tmp, 1L))
    finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("a directory whose filesystem lacks the margin is refused") {
    val tmp = java.nio.file.Files.createTempDirectory("scratch-gate")
    try assert(!Bench.scratchEligible(tmp, Long.MaxValue),
      "no filesystem has Long.MaxValue usable bytes — the gate must refuse")
    finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("a missing directory is refused rather than thrown on") {
    assert(!Bench.scratchEligible(
      java.nio.file.Paths.get("/nonexistent-graft-scratch-probe"), 1L))
  }
}
