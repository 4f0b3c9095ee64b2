package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Z-order layout: the write must preserve the rows exactly, and the
  * point of the curve — per-file locality in EVERY clustered dimension,
  * not just the leading sort column — must be measurable in the file
  * statistics the format's zone skipping actually uses.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def orders = Tables.load(spark, sf, "orders")

  /** Per-file (min, max) of a column, one row per parquet part file. */
  private def fileRanges(dir: String, c: String): Seq[(Double, Double)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    files.toSeq.map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
      (r.get(0).toString.toDouble, r.get(1).toString.toDouble)
    }
  }

  /** Mean fraction of the global [min, max] span covered per file —
    * 1.0 ⇒ every file spans everything (no skipping possible). */
  private def meanCoverage(dir: String, c: String): Double = {
    val rs = fileRanges(dir, c)
    val lo = rs.map(_._1).min
    val hi = rs.map(_._2).max
    rs.map { case (a, b) => (b - a) / (hi - lo) }.sum / rs.size
  }

  test("zordered write round-trips the rows exactly and drops the scratch key") {
    val dir = Files.createTempDirectory("graft-zorder").toString + "/orders"
    Layout.writeZordered(orders, Seq("o_custkey", "o_totalprice"), dir, targetFiles = 8)
    val back = spark.read.parquet(dir)
    assert(back.columns.sorted.toSeq == orders.columns.sorted.toSeq)
    val a = orders.select("o_orderkey").as[Long].collect().sorted
    val b = back.select("o_orderkey").as[Long].collect().sorted
    assert(a.toSeq == b.toSeq, "zorder write must be a pure re-layout")
  }

  test("z-order tightens per-file ranges on BOTH dimensions; linear sort only on the first") {
    val base = Files.createTempDirectory("graft-zorder-cmp").toString
    val zDir = s"$base/z"
    val linDir = s"$base/lin"
    Layout.writeZordered(orders, Seq("o_custkey", "o_totalprice"), zDir, targetFiles = 8)
    // the layout z-order competes with: range-partition + sort on the
    // leading column, second column as tie-break
    orders.repartitionByRange(8, col("o_custkey"), col("o_totalprice"))
      .sortWithinPartitions("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(linDir)

    val zKey = meanCoverage(zDir, "o_custkey")
    val zPrice = meanCoverage(zDir, "o_totalprice")
    val linKey = meanCoverage(linDir, "o_custkey")
    val linPrice = meanCoverage(linDir, "o_totalprice")

    // linear: tight on the sort column, blind on the second
    assert(linKey < 0.35, s"linear layout should be tight on its sort column, got $linKey")
    assert(linPrice > 0.8, s"fixture degenerate: linear layout unexpectedly tight on price ($linPrice)")
    // z-order: meaningfully tight on BOTH (8 files over a 2-D curve ⇒
    // each file covers a fraction of each axis, not a full stripe)
    assert(zKey < 0.75, s"z-order per-file custkey coverage too wide: $zKey")
    assert(zPrice < 0.75, s"z-order per-file price coverage too wide: $zPrice")
    assert(zPrice < linPrice * 0.8,
      s"z-order must beat linear on the non-leading column: $zPrice vs $linPrice")
  }

  test("file-skipping proxy: a price-band predicate intersects fewer z-ordered files") {
    val base = Files.createTempDirectory("graft-zorder-skip").toString
    val zDir = s"$base/z"
    val linDir = s"$base/lin"
    Layout.writeZordered(orders, Seq("o_custkey", "o_totalprice"), zDir, targetFiles = 8)
    orders.repartitionByRange(8, col("o_custkey"), col("o_totalprice"))
      .sortWithinPartitions("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(linDir)

    // a 5%-of-span band on the NON-leading column: the stats-based prune
    // a reader does is "skip files whose [min, max] misses the band"
    val prices = orders.select(min("o_totalprice"), max("o_totalprice")).head()
    val (lo, hi) = (prices.getDouble(0), prices.getDouble(1))
    val bandLo = lo + 0.40 * (hi - lo)
    val bandHi = lo + 0.45 * (hi - lo)
    def touched(dir: String): Int =
      fileRanges(dir, "o_totalprice").count { case (a, b) => b >= bandLo && a <= bandHi }

    val zTouched = touched(zDir)
    val linTouched = touched(linDir)
    assert(linTouched >= 7, s"fixture degenerate: linear layout should touch ~all 8 files, got $linTouched")
    assert(zTouched < linTouched,
      s"z-order must let a band predicate skip files: touched $zTouched vs linear $linTouched")
  }

  test("BoundaryBucket: exact boundary semantics, NaN to the top, null stays null") {
    val bounds = Array(10.0, 20.0, 30.0)
    val df = Seq[java.lang.Double](5.0, 10.0, 15.0, 30.0, 35.0, Double.NaN, null)
      .toDF("v")
    val got = df.select(org.apache.spark.sql.GraftColumnBridge.column(
      graft.sources.BoundaryBucket(
        org.apache.spark.sql.GraftColumnBridge.expression(col("v")), bounds)).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq == Seq(0, 1, 1, 3, 3, 3, null),
      "bucket = #boundaries at or below v; NaN sorts above all; null passes through")
  }

  test("zorderKey interleaves bits: adjacent in both dims means adjacent on the curve") {
    // two columns, 2 bits each: bucket pairs (b1, b0) -> key positions
    // b0 bit i at 2i, b1 bit i at 2i+1
    val bounds = Seq(Array(1.0, 2.0, 3.0), Array(10.0, 20.0, 30.0))
    val df = Seq((0.5, 5.0), (2.5, 25.0), (3.5, 35.0)).toDF("x", "y")
    val keys = df.select(
      Layout.zorderKey(bounds, Seq(col("x"), col("y")), bitsPerCol = 2).as("z"))
      .as[Long].collect().toSeq
    // (0,0) -> 0; (2,2) -> interleave(10,10) = 1100b = 12; (3,3) -> 1111b = 15
    assert(keys == Seq(0L, 12L, 15L), s"unexpected Morton keys: $keys")
  }

  test("BoundaryBucket rejects a non-double child at analysis time") {
    val df = Seq(1, 2, 3).toDF("v") // IntegerType — would CCE/codegen-fail at runtime
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(org.apache.spark.sql.GraftColumnBridge.column(
        graft.sources.BoundaryBucket(
          org.apache.spark.sql.GraftColumnBridge.expression(col("v")), Array(1.5))))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("boundary_bucket"),
      s"expected the type-check failure to name the expression, got: ${e.getMessage}")
  }
}
