package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.{doubleDot, longDot}

/** The codegen'd dot kernels must be value-identical to the
  * `aggregate(zip_with(...))` higher-order folds they replaced — including
  * the null edges — and their generated Java must actually COMPILE (a
  * doGenCode bug would silently fall back to interpreted eval and the
  * perf win would be fiction).
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofLongDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), _ + _)
  private def hofDoubleDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (u, v) => u.cast("double") * v.cast("double")), lit(0.0), _ + _)

  test("longDot/doubleDot match the higher-order fold on random vectors (bit-identical)") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(64) { i =>
      (i.toLong,
        Array.fill(48)(rnd.nextLong() % 1000000L),
        Array.fill(48)(rnd.nextLong() % 1000000L),
        Array.fill(48)(rnd.nextFloat()),
        Array.fill(48)(rnd.nextFloat()))
    }.toDF("id", "la", "lb", "fa", "fb")
    val out = rows.select(
      (longDot(col("la"), col("lb")) <=> hofLongDot(col("la"), col("lb"))).as("l_eq"),
      (longDot(col("la"), col("la")) <=> hofLongDot(col("la"), col("la"))).as("n_eq"),
      // bit-identical doubles: same element order, same sequential fold
      (doubleDot(col("fa"), col("fb")) <=> hofDoubleDot(col("fa"), col("fb"))).as("d_eq"))
      .agg(count(when(col("l_eq") && col("n_eq") && col("d_eq"), 1)).as("ok"))
      .as[Long].head()
    assert(out == 64L)
  }

  test("null semantics replicate the fold: length mismatch and null elements poison to NULL") {
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)), // clean
      (2L, Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](3L, 4L)), // length mismatch
      (3L, Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)) // null element
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), longDot(col("a"), col("b")).as("d"),
        hofLongDot(col("a"), col("b")).as("h"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got(1L) == ((Some(11L), Some(11L))))
    assert(got(2L) == ((None, None)), s"length mismatch must be NULL like the fold: $got")
    assert(got(3L) == ((None, None)), s"null element must poison like the fold: $got")
    // null INPUT array → NULL (BinaryExpression null-safety)
    val nullIn = Seq((1L, null: Seq[Long], Seq(1L, 2L))).toDF("id", "a", "b")
      .select(longDot(col("a"), col("b"))).head()
    assert(nullIn.isNullAt(0))
  }

  test("generated code compiles under CODEGEN_ONLY (no silent interpreted fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = Seq((Array(2L, 3L), Array(0.5, 0.25)))
        .toDF("l", "d")
        .select(
          longDot(col("l"), col("l")).as("ll"),
          doubleDot(col("d"), col("d")).as("dd"))
        .head()
      assert(r.getLong(0) == 13L)
      assert(math.abs(r.getDouble(1) - 0.3125) < 1e-15)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("the ANN verify tail plans the kernel, not a CodegenFallback HOF") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val p = graft.operators.Similarity
      .lshBucketedTopK(embs, "vec_id", "embedding", col("vec_id") < 5, k = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("long_array_dot"), s"expected the codegen'd kernel in the plan:\n$p")
    assert(!p.contains("zip_with") && !p.contains("aggregate("),
      "no higher-order-function fallback may remain in the scoring path")
  }
}
