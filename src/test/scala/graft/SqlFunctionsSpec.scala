package graft

import org.apache.spark.sql.execution.ExplainMode

/** The SQL front-door: the codegen'd kernels must be reachable by name from
  * plain `spark.sql`, with the Scala API's exact semantics (they resolve to
  * the SAME Catalyst expressions, not UDF wrappers).
  */
class SqlFunctionsSpec extends SparkSpec {

  // The shared test session is built by GraftSession.builder, so the
  // extension is installed; retrofit is idempotent over it.
  GraftExtensions.registerFunctions(spark)

  test("long_array_dot is callable from SQL with exact integer semantics") {
    val r = spark.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head()
    assert(r.getLong(0) == 32L)
  }

  test("char_bigrams and oov_bigram_counts are callable from SQL") {
    val r = spark.sql(
      """SELECT char_bigrams('abc') AS bg,
        |  oov_bigram_counts('abc', array('ab')) AS c""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("ab", "bc"))
    val c = r.getStruct(1)
    assert(c.getLong(0) == 2L && c.getLong(1) == 1L)
  }

  test("double_array_dot casts float arrays like the Scala API") {
    val r = spark.sql(
      """SELECT double_array_dot(
        |  array(CAST(0.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |  array(CAST(4.0 AS FLOAT), CAST(0.25 AS FLOAT))) AS d""".stripMargin).head()
    assert(r.getDouble(0) == 2.5)
  }

  test("SQL kernels keep the fold's null semantics: length mismatch and null elements") {
    val rows = spark.sql(
      """SELECT long_array_dot(array(1L, 2L), array(1L)) AS mismatch,
        |       long_array_dot(array(1L, NULL), array(1L, 2L)) AS nullelem,
        |       long_array_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS nullinput""".stripMargin).head()
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
  }

  test("SQL invocation resolves to the codegen'd expression, not a fallback") {
    // non-foldable input (id varies) so constant folding can't pre-evaluate
    spark.sql("SELECT id, array(CAST(id AS DOUBLE), 2.0) AS v FROM range(4)")
      .createOrReplaceTempView("vecs_sql")
    val df = spark.sql("SELECT double_array_dot(v, v) AS n2 FROM vecs_sql WHERE id = 1")
    assert(df.head().getDouble(0) == 5.0)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // formatted mode marks whole-stage-codegen operators with [codegen id];
    // the Project evaluating the kernel must carry one
    val projLine = plan.linesIterator.find(l => l.contains("Project") && l.contains("codegen id"))
    assert(projLine.isDefined, s"kernel's Project left whole-stage codegen:\n$plan")
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("double_array_dot"), s"expected the kernel expression:\n$analyzed")
  }

  test("wrong arity is a clear error") {
    val e = intercept[Exception](spark.sql("SELECT long_array_dot(array(1L))").head())
    assert(e.getMessage.contains("long_array_dot"), e.getMessage)
  }

  test("long_top_k aggregates from SQL: heap order, ties to min id, literal k") {
    val rows = spark.sql(
      """SELECT g, long_top_k(ord, id, 2) AS top FROM VALUES
        |  ('a', 5L, 10L), ('a', 5L, 3L), ('a', 9L, 7L), ('a', 1L, 1L),
        |  ('b', 2L, 2L)
        |AS t(g, ord, id) GROUP BY g ORDER BY g""".stripMargin)
      .collect()
    val a = rows(0).getSeq[org.apache.spark.sql.Row](1).map(r => (r.getLong(0), r.getLong(1)))
    val b = rows(1).getSeq[org.apache.spark.sql.Row](1).map(r => (r.getLong(0), r.getLong(1)))
    assert(a == Seq((9L, 7L), (5L, 3L))) // tie at ord=5 keeps the smaller id
    assert(b == Seq((2L, 2L)))
    val e = intercept[Exception](
      spark.sql("SELECT long_top_k(ord, id, id) FROM VALUES (1L, 1L) AS t(ord, id)").head())
    assert(e.getMessage.contains("long_top_k"), e.getMessage)
  }
}
