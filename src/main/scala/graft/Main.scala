package graft

/** Default main (wired via `Compile / run / mainClass`): a bare `sbt run`
  * must never hit sbt's INTERACTIVE main-class chooser — with multiple
  * mains in the project that prompt blocks forever under a driver/CI
  * invocation. Dispatches on the argument shape the two contract mains
  * use: `<sfDir> <outDir>` → Verify; no args (SPARK_GRAFT_SF_DIR env) →
  * Bench.
  */
object Main {
  def main(args: Array[String]): Unit =
    if (args.length >= 2) Verify.main(args) else Bench.main(args)
}
