package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd character-bigram kernels for the corpus-quality hot path.
  *
  * [[TextAnalysis.oovBigramScore]] originally built bigrams with
  * `transform(sequence(1, length-1), i => substr(t, i, 2))` — a
  * `CodegenFallback` higher-order function that leaves whole-stage codegen
  * and allocates a lambda-bound row per CHARACTER of the corpus, then
  * re-aggregated the exploded bigrams per document through a shuffle. These
  * expressions do the same work as tight per-row loops:
  *
  *  - [[CharBigrams]] emits the bigram array natively (vocab pass);
  *  - [[OovBigramCounts]] scores a document against the (broadcast) vocab
  *    array entirely in-row — no explode, no join, no per-doc shuffle.
  *
  * Bigrams are CHARACTER-based (`UTF8String.substring` counts codepoints),
  * matching both the `substr` lambda they replace and the DuckDB oracle's
  * `substr(t, i, 2)`.
  */
object TextExpressions {

  /** Array of the `numChars - 1` overlapping character bigrams of `s`
    * (empty array below 2 chars; NULL on NULL input).
    */
  def charBigrams(s: Column): Column =
    GraftColumnBridge.column(CharBigrams(GraftColumnBridge.expression(s)))

  /** `struct(n_bigrams, n_oov)` of `s` against `vocab` — the bigram total
    * and how many fall outside the vocabulary. NULL if either input is NULL
    * (feed a `coalesce(t, '')` text column to score blank docs as (0, 0)).
    */
  /** Unicode-normalize `s` to `form` (NFC/NFD/NFKC/NFKD). */
  def unicodeNormalize(s: Column, form: String): Column =
    GraftColumnBridge.column(UnicodeNormalize(GraftColumnBridge.expression(s), form))

  def oovBigramCounts(s: Column, vocab: Column): Column =
    GraftColumnBridge.column(OovBigramCounts(
      GraftColumnBridge.expression(s), GraftColumnBridge.expression(vocab)))
}

/** Row-level kernels shared by interpreted eval and generated code (top-level
  * object → Scala emits Java-static forwarders, so generated Java calls
  * `graft.functions.TextExprKernels.charBigrams(...)` directly).
  */
object TextExprKernels {

  def charBigrams(s: UTF8String): ArrayData = {
    val n = s.numChars()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = s.substring(i, i + 2)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One pass over the document: count bigrams and vocabulary misses.
    * The per-row vocab set build is ~|vocab| hash inserts against ~numChars
    * probes; the broadcast array is not reference-stable across rows, so a
    * cross-row memo would need value hashing that costs as much as the build.
    */
  def unicodeNormalize(s: UTF8String, form: String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.valueOf(form)))

  def oovCounts(s: UTF8String, vocab: ArrayData): InternalRow = {
    val n = s.numChars()
    if (n < 2) return InternalRow(0L, 0L)
    val m = vocab.numElements()
    val set = new java.util.HashSet[UTF8String](Math.max(4, m * 2))
    var j = 0
    while (j < m) {
      if (!vocab.isNullAt(j)) set.add(vocab.getUTF8String(j))
      j += 1
    }
    var oov = 0L
    var i = 0
    while (i < n - 1) {
      if (!set.contains(s.substring(i, i + 2))) oov += 1
      i += 1
    }
    InternalRow((n - 1).toLong, oov)
  }
}

case class CharBigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_bigrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextExprKernels.charBigrams(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.TextExprKernels.charBigrams($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class OovBigramCounts(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false)))
  override def prettyName: String = "oov_bigram_counts"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<string>) inputs, got ${l.simpleString} and ${r.simpleString}")
  }

  override protected def nullSafeEval(s: Any, vocab: Any): Any =
    TextExprKernels.oovCounts(s.asInstanceOf[UTF8String], vocab.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (s, v) => s"${ev.value} = graft.functions.TextExprKernels.oovCounts($s, $v);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unicode normalization of a string column to a canonical form — the
  * text-canonicalization primitive in front of fingerprint/dedup: "café"
  * composed (U+00E9) and decomposed (e + U+0301) must hash identically or
  * every accent-bearing near-dup silently survives exact dedup.
  *
  * `form` is a compile-time constant (NFC/NFD/NFKC/NFKD), validated at
  * construction, so the generated code references the enum constant
  * directly — no per-row form lookup. The kernel delegates to
  * `java.text.Normalizer` (the JDK's ICU-derived implementation): already
  *-normalized ASCII fast-paths through `Normalizer.isNormalized`-style
  * quick checks inside the JDK, so the common English-corpus case costs a
  * scan, not a rebuild. NULL in, NULL out.
  */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
  require(UnicodeNormalize.Forms.contains(form),
    s"unicode_normalize: form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got $form")
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    TextExprKernels.unicodeNormalize(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}
