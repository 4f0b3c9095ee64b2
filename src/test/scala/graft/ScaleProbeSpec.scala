package graft.tools

import org.scalatest.funsuite.AnyFunSuite



/** The rung protocol's cache-equalization helper must be safe to call
  * blind (missing dirs, empty dirs, permission oddities are all
  * "skip, don't crash" — a failed warm-up must never vaporize a rung)
  * and must actually touch every parquet byte when the dir is real.
  */
class ScaleProbeSpec extends AnyFunSuite {

  test("precacheParquet on a missing or empty dir is a silent no-op") {
    ScaleProbe.precacheParquet("/nonexistent/definitely/not/here")
    val empty = java.nio.file.Files.createTempDirectory("probe-spec-empty")
    try ScaleProbe.precacheParquet(empty.toString)
    finally java.nio.file.Files.deleteIfExists(empty)
  }

  test("precacheParquet reads every .parquet byte and ignores other files") {
    val dir = java.nio.file.Files.createTempDirectory("probe-spec")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("t.parquet"))
    val pq = sub.resolve("part-0000.parquet")
    val other = dir.resolve("notes.txt")
    try {
      java.nio.file.Files.write(pq, Array.fill[Byte](3 << 20)(7))
      java.nio.file.Files.write(other, "not parquet".getBytes("UTF-8"))
      // the helper reports bytes to stderr; the observable contract here is
      // simply that a real tree with a >buffer-sized file completes without
      // throwing (the byte count is asserted by the stderr line in rung logs)
      ScaleProbe.precacheParquet(dir.toString)
    } finally {
      java.nio.file.Files.deleteIfExists(pq)
      java.nio.file.Files.deleteIfExists(other)
      java.nio.file.Files.deleteIfExists(sub)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }
}
