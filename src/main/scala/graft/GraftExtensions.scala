package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{CharBigrams, DoubleArrayDot, LongArrayDot, LongTopK, OovBigramCounts, UnicodeNormalize}

/** SQL front-door for the custom Catalyst kernels: registers the
  * codegen'd scalar expressions (dot products, bigram kernels,
  * `unicode_normalize`) and the bounded-heap `long_top_k` aggregate in the
  * session `FunctionRegistry`, so SQL-only users (`spark.sql(...)`,
  * thrift/connect clients) can reach the hot-path primitives the operator
  * library builds on:
  *
  * {{{
  *   SELECT double_array_dot(embedding, embedding) AS norm2 FROM embeddings
  *   -- cosine over pre-normalized vectors is a bare dot product:
  *   SELECT a.id, b.id, double_array_dot(a.unit, b.unit) FROM ...
  * }}}
  *
  * Registered as real `FunctionRegistry` entries — NOT `spark.udf.register`
  * (a UDF would box every array and fall out of whole-stage codegen,
  * exactly what these expressions exist to avoid).
  *
  * Activation paths, in preference order:
  *   - [[GraftSession.builder]] injects it into every session it CREATES
  *     (caveat: `getOrCreate` silently returns any pre-existing session,
  *     on which `withExtensions` is a no-op — [[GraftSession.local]]
  *     retrofits via `registerFunctions` to close that gap; do the same
  *     after any `getOrCreate` that might reuse a session);
  *   - `--conf spark.sql.extensions=graft.GraftExtensions` for sessions
  *     built elsewhere (spark-submit, notebooks, Spark Connect servers);
  *   - [[GraftExtensions.registerFunctions]] retrofits a LIVE session.
  *
  * `double_array_dot` mirrors [[graft.functions.VectorExpressions.doubleDot]]:
  * each argument gets one whole-array cast to `array<double>`, so
  * `array<float>` embedding columns work directly with values identical to
  * the Scala API. `long_array_dot` is exact and uncasted by design — the
  * fixed-point path must never silently widen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, clazz: Class[_], usage: String): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, null, name, usage, "", "", "", "math_funcs", "4.0.0", "", "built-in")

  private def arity1(name: String)(build: Expression => Expression): FunctionBuilder = {
    case Seq(a) => build(a)
    case exprs =>
      throw new IllegalArgumentException(
        s"$name requires exactly 1 argument, got ${exprs.length}")
  }

  private def arity2(name: String)(build: (Expression, Expression) => Expression): FunctionBuilder = {
    case Seq(a, b) => build(a, b)
    case exprs =>
      throw new IllegalArgumentException(
        s"$name requires exactly 2 arguments, got ${exprs.length}")
  }

  /** The registry entries (shared by the extension injector and the live
    * retrofit): name, documentation, builder.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("long_array_dot"),
      info("long_array_dot", classOf[LongArrayDot],
        "long_array_dot(a, b) - Exact integer dot product of two array<bigint> columns; NULL on length mismatch or NULL element. long_array_dot(a, a) is the squared norm."),
      arity2("long_array_dot")(LongArrayDot(_, _))),
    (FunctionIdentifier("double_array_dot"),
      info("double_array_dot", classOf[DoubleArrayDot],
        "double_array_dot(a, b) - Double dot product of two numeric array columns (each argument gets one whole-array cast to array<double>); NULL on length mismatch or NULL element."),
      arity2("double_array_dot") { (a, b) =>
        val at = ArrayType(DoubleType)
        DoubleArrayDot(Cast(a, at), Cast(b, at))
      }),
    (FunctionIdentifier("char_bigrams"),
      info("char_bigrams", classOf[CharBigrams],
        "char_bigrams(s) - Array of the numChars-1 overlapping character bigrams of s (codepoint-based); empty below 2 chars, NULL on NULL."),
      arity1("char_bigrams")(CharBigrams(_))),
    (FunctionIdentifier("oov_bigram_counts"),
      info("oov_bigram_counts", classOf[OovBigramCounts],
        "oov_bigram_counts(s, vocab) - struct(n_bigrams, n_oov): total character bigrams of s and how many fall outside the vocab array<string>; NULL if either input is NULL."),
      arity2("oov_bigram_counts")(OovBigramCounts(_, _))),
    (FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize", classOf[UnicodeNormalize],
        "unicode_normalize(s, form) - Unicode-normalize s to the literal form 'NFC'/'NFD'/'NFKC'/'NFKD'; NULL on NULL input. NFC before fingerprinting makes composed and decomposed encodings of the same text hash identically."),
      { case Seq(s, f) if f.foldable && f.eval() != null =>
          UnicodeNormalize(s, f.eval().toString)
        case exprs =>
          throw new IllegalArgumentException(
            "unicode_normalize requires (string, form) with form a non-null string literal, " +
              s"got ${exprs.length} argument(s)")
      }),
    (FunctionIdentifier("long_top_k"),
      info("long_top_k", classOf[LongTopK],
        "long_top_k(ord, id, k) - Aggregate: top-k (ord, id) bigint pairs per group by (ord DESC, id ASC), as array<struct<ord,id>> best-first. Bounded k-entry heap state with map-side partials - no group ever sorts. k must be a literal."),
      { case Seq(ord, id, k) if k.foldable && k.eval() != null =>
          val kv = k.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"long_top_k: k must be an integer literal, got $other")
          }
          LongTopK(ord, id, kv)
        case exprs =>
          throw new IllegalArgumentException(
            "long_top_k requires (ord, id, k) with k a non-null integer literal, " +
              s"got ${exprs.length} argument(s)")
      }))

  /** Register the functions in an already-running session (equivalent to
    * having built it with the extension installed; idempotent — re-register
    * simply overwrites the same entries).
    */
  def registerFunctions(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
