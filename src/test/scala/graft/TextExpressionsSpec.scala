package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions.{charBigrams, oovBigramCounts}

/** The codegen'd bigram kernels must be value-identical to the interpreted
  * `transform(sequence(1, length-1), i => substr(t, i, 2))` construction
  * they replaced — including character (not byte) semantics on multibyte
  * text — and their generated Java must actually COMPILE (a doGenCode bug
  * would silently fall back to interpreted eval).
  */
class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  /** The HOF construction oovBigramScore used before the kernel existed. */
  private def hofBigrams(t: Column): Column =
    when(length(t) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(t) - 1), i => substr(t, i, lit(2))))

  private val samples = Seq(
    "", "a", "ab", "abc", "the quick brown fox", "aaaa",
    "héllo wörld", "日本語のテキスト", "mixed 日本 and ascii", "  spaced  ",
    "zqxj##@@||~~^^")

  test("charBigrams matches the substr HOF on ascii, multibyte and edge-length strings") {
    val df = samples.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "t")
    val bad = df.select(
        (charBigrams(col("t")) <=> hofBigrams(col("t"))).as("eq"))
      .filter(!col("eq")).count()
    assert(bad == 0L)
  }

  test("charBigrams is codepoint-based and null-preserving") {
    val df = Seq((1, "日本語"), (2, null.asInstanceOf[String])).toDF("id", "t")
    val got = df.select(col("id"), charBigrams(col("t")).as("bg"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(got(1).get.asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("日本", "本語"),
      "multibyte bigrams must split on characters, not bytes")
    assert(got(2).isEmpty, "NULL text must yield NULL, not an empty array")
  }

  test("oovBigramCounts matches an explode+join fold and handles blanks/multibyte") {
    val vocabArr = array(lit("th"), lit("he"), lit("日本"))
    val df = Seq((1, "the"), (2, ""), (3, "x"), (4, "日本語"), (5, "zz"))
      .toDF("id", "t")
    val got = df.select(col("id"), oovBigramCounts(col("t"), vocabArr).as("c"))
      .select(col("id"), col("c.n_bigrams"), col("c.n_oov"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1) == ((2L, 0L)), "'th','he' both in vocab")
    assert(got(2) == ((0L, 0L)), "blank doc")
    assert(got(3) == ((0L, 0L)), "single char has no bigrams")
    assert(got(4) == ((2L, 1L)), "'日本' in vocab, '本語' not")
    assert(got(5) == ((1L, 1L)), "'zz' fully OOV")
  }

  test("generated code compiles: kernels agree with interpreted eval under CODEGEN_ONLY") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      val df = samples.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "t")
      val q = () => df.select(
          charBigrams(col("t")).as("bg"),
          oovBigramCounts(col("t"), array(lit("th"), lit("ab"))).as("c"))
        .select(col("bg"), col("c.n_bigrams"), col("c.n_oov"))
        .collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = q()
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = q()
      assert(gen == interp)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("unicodeNormalize: NFC composes, NFKC folds compatibility, NULL passes") {
    import graft.functions.{TextAnalysis, TextExpressions}
    // "e" + COMBINING ACUTE vs precomposed "é"; "ﬁ" ligature for NFKC
    val decomposed = "Cafe\u0301"
    val precomposed = "Caf\u00e9"
    val df = Seq((1, decomposed), (2, precomposed), (3, "ﬁn"), (4, null))
      .toDF("id", "t")
    val nfc = df.select(col("id"), TextExpressions.unicodeNormalize(col("t"), "NFC").as("n"))
      .as[(Int, Option[String])].collect().toMap
    assert(nfc(1) == nfc(2) && nfc(1).contains(precomposed))
    assert(nfc(4).isEmpty) // NULL in, NULL out
    val nfkc = df.select(col("id"), TextExpressions.unicodeNormalize(col("t"), "NFKC").as("n"))
      .as[(Int, Option[String])].collect().toMap
    assert(nfkc(3).contains("fin")) // ligature folded
    assert(nfc(3).contains("ﬁn")) // NFC must NOT fold compatibility chars
    // canonicalText: encoding-variant mirrors collapse to identical strings
    val canon = df.filter(col("id") <= 2)
      .select(TextAnalysis.canonicalText(concat(lit("  A  B\t"), col("t"))).as("c"))
      .as[String].collect().toSet
    assert(canon == Set("a b caf\u00e9"))
    intercept[IllegalArgumentException] {
      TextExpressions.unicodeNormalize(col("t"), "NFX")
    }
  }
}
