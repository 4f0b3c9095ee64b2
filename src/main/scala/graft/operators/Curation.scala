package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** The end-to-end corpus-curation pass a training-data pipeline runs over
  * raw documents: quality-score → threshold filter → fingerprint dedup
  * (deterministic min-id survivor) → language tag. Composes the existing
  * operators; exists as a first-class function because the COMPOSITION is
  * the product — one narrow scan-side pass (features + filter + fingerprint
  * are all codegen'd projections over the text column), then exactly ONE
  * shuffle (the dedup's hash aggregation on the fingerprint), then the
  * language tag on the survivors.
  *
  * Scale: the quality filter runs BEFORE the dedup shuffle, so junk rows
  * never ship; the dedup groups by a 64-char sha, which is uniform —
  * skew-free by construction at any corpus size.
  */
object Curation {

  /** Cheap-signal quality gates; defaults tuned to drop degenerate rows
    * (empty, numeric tables, shouting) without modeling. The repetition
    * gates (Gopher-style, [[TextAnalysis.repetitionStats]]) are OFF by
    * default — when set, documents exceeding the duplicate-line /
    * duplicate-3-gram fractions are dropped scan-side too, and the four
    * repetition columns ride along in the output.
    */
  final case class QualityThresholds(
      minChars: Int = 20,
      minTokens: Int = 5,
      maxDigitRatio: Double = 0.2,
      maxUpperRatio: Double = 0.3,
      maxDupLineRatio: Option[Double] = None,
      maxDup3gramRatio: Option[Double] = None)

  /** Curate `df`: returns the surviving rows with quality features, a
    * `fingerprint` column, and `lang_pred`. Survivor of a fingerprint
    * group is the row with the minimum `idCol` (deterministic).
    */
  def curate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      th: QualityThresholds = QualityThresholds()): DataFrame = {
    val gated = TextAnalysis.qualityFeatures(df, textCol)
      .filter(
        col("n_chars") >= th.minChars &&
          col("n_tokens") >= th.minTokens &&
          col("digit_ratio") <= th.maxDigitRatio &&
          col("upper_ratio") <= th.maxUpperRatio)
    val repGated =
      if (th.maxDupLineRatio.isEmpty && th.maxDup3gramRatio.isEmpty) gated
      else {
        val rep = TextAnalysis.repetitionStats(gated, textCol)
        val lineOk = th.maxDupLineRatio.map(col("dup_line_ratio") <= _).getOrElse(lit(true))
        val gramOk = th.maxDup3gramRatio.map(col("dup_3gram_ratio") <= _).getOrElse(lit(true))
        rep.filter(lineOk && gramOk)
      }
    val scored = repGated.withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
    // min-id survivor per fingerprint via Dedup's min-over-window: ONE
    // shuffle of the scored frame (the agg+join alternative shuffles it
    // twice), and the sha fingerprint key is uniform — skew-free.
    Dedup.dropExactDuplicates(scored, idCol, Seq("fingerprint"))
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
  }
}
