package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.longDot

/** Micro-benchmark: the codegen'd [[graft.functions.LongArrayDot]] kernel
  * vs the `aggregate(zip_with(...))` higher-order fold it replaced, over
  * N synthetic 64-dim quantized vectors (pair-free — measures pure
  * expression eval, the ANN verify tail's inner loop). Usage:
  * {{{ DotBench [rows] [iters] }}}
  */
object DotBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 2000000L
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.range(rows)
      .select(col("id"),
        transform(sequence(lit(0), lit(63)), i => (col("id") + i) % 10007L).as("a"),
        transform(sequence(lit(0), lit(63)), i => (col("id") * 31 + i) % 9973L).as("b"))
      .persist()
    base.count() // materialize input outside the timed region
    def time(label: String, c: org.apache.spark.sql.Column): Unit =
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        base.select(sum(c)).head() // sum forces every row's dot
        println(f"[dotbench] $label iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows%d rows)")
      }
    time("hof   ", aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), _ + _))
    time("kernel", longDot(col("a"), col("b")))
    spark.stop()
  }
}
