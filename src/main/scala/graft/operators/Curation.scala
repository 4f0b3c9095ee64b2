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

  /** Per-source corpus health report — the keep/reweight/drop decision
    * surface of corpus curation: one row per `sourceCol` value with doc
    * and token counts, the number of docs whose normalized fingerprint
    * appears 2+ times ANYWHERE in the corpus (cross-source duplication —
    * mirror sites show up as sources with a high `dup_fraction`), distinct
    * language count, and mean tokens per doc. Every statistic is an
    * integer sum (or a single final division of two exact integers), so
    * the report is bit-stable across engines and partitionings.
    *
    * Scale: same count-then-probe shape as the duplicated-span detector —
    * the global fingerprint vote aggregates 64-char sha keys (uniform,
    * skew-free) with map-side combine and joins back broadcast-or-SMJ;
    * the final per-source aggregation groups by the (low-cardinality)
    * source key.
    */
  def sourceReport(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      langCol: String): DataFrame = {
    require(Seq(sourceCol, textCol, langCol).forall(df.columns.contains),
      s"input needs columns '$sourceCol', '$textCol', '$langCol', has: ${df.columns.mkString(", ")}")
    val fp = df.select(col(sourceCol).as("source"), col(langCol).as("__lang"),
      TextAnalysis.tokenCount(col(textCol)).as("__toks"),
      TextAnalysis.fingerprint(col(textCol)).as("__fp"))
    val counts = fp.groupBy("__fp").agg(count(lit(1)).as("__n"))
    fp.join(counts, "__fp")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__toks")).as("n_tokens"),
        sum(when(col("__n") >= 2, 1L).otherwise(0L)).as("n_dup_docs"),
        countDistinct(col("__lang")).as("n_langs"))
      .withColumn("dup_fraction", col("n_dup_docs").cast("double") / col("n_docs"))
      .withColumn("mean_doc_tokens", col("n_tokens").cast("double") / col("n_docs"))
  }

  /** Winsorization-style outlier gate: keep rows whose `valueCol` lies
    * within the `[loQ, hiQ]` quantiles of their group — the "drop the
    * freakishly short and the freakishly long documents per language"
    * curation step.
    *
    * Plan shape: one grouped quantile aggregation over the low-cardinality
    * groups (languages, sources), its bounds broadcast back over the
    * corpus, then a scan-side filter — the corpus itself never shuffles.
    * `exact = true` buffers each group's values in the quantile aggregate
    * (the oracle-able variant; fine while groups fit an executor);
    * the default `exact = false` uses `approx_percentile` with bounded
    * state — the 100 TB path, where a per-mille boundary error only
    * shifts a statistical cutoff, not a correctness contract.
    *
    * Rows with a NULL group key or NULL value are dropped (an outlier gate
    * can't place them; matches the SQL equi-join oracle's semantics).
    */
  def quantileGate(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      loQ: Double,
      hiQ: Double,
      exact: Boolean = false): DataFrame = {
    require(groupCols.nonEmpty, "quantileGate needs at least one group column")
    require(0.0 <= loQ && loQ < hiQ && hiQ <= 1.0,
      s"need 0 <= loQ < hiQ <= 1, got ($loQ, $hiQ)")
    val reserved = Seq("__qb", "__q_lo", "__q_hi").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input columns collide with quantileGate's scratch names (${reserved.mkString(", ")}) — rename them first")
    val q = array(lit(loQ), lit(hiQ))
    val qAgg =
      if (exact) percentile(col(valueCol), q)
      else approx_percentile(col(valueCol), q, lit(10000))
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(qAgg.as("__qb"))
      .select(groupCols.map(col) :+
        col("__qb").getItem(0).as("__q_lo") :+
        col("__qb").getItem(1).as("__q_hi"): _*)
    df.join(broadcast(bounds), groupCols, "inner")
      .filter(col(valueCol) >= col("__q_lo") && col(valueCol) <= col("__q_hi"))
      .drop("__q_lo", "__q_hi")
  }

  /** Select the best-scoring rows until a TOKEN budget fills — "give me the
    * top N tokens of training data by quality": rows in `(scoreCol desc,
    * idCol asc)` order are kept while the running token total stays ≤
    * `budget` (whole-document granularity; the first document that would
    * overflow, and everything after it, is dropped).
    *
    * The naive form is a global-order cumulative window — one partition
    * holding the corpus. Instead the cumsum runs over DISTINCT SCORE
    * VALUES (per-score token subtotals: one map-side-combined aggregation,
    * then a window over the score domain — bounded by score resolution,
    * e.g. ≤10⁶ rows for micro-unit scores, NOT by corpus size): every row
    * whose whole score-bucket fits is kept outright, and only the single
    * BOUNDARY bucket ranks its rows (window partitioned by that one score
    * value, id-ordered). Both the bucket decision and the boundary rank
    * broadcast back as filters, so corpus rows never sort globally.
    * `scoreCol`/`tokensCol` must be integers (fixed-point) — the running
    * totals and the keep decision are then exact in any engine.
    */
  def selectTokenBudget(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val reserved = Seq("__bt", "__cum", "__prev", "__run")
    require(reserved.forall(c => !df.columns.contains(c)),
      s"input columns collide with selectTokenBudget's scratch names — rename them first")
    import org.apache.spark.sql.expressions.Window
    val perScore = df.groupBy(col(scoreCol)).agg(sum(col(tokensCol)).as("__bt"))
    val scoreWin = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = perScore
      .withColumn("__cum", sum(col("__bt")).over(scoreWin))
      .withColumn("__prev", col("__cum") - col("__bt"))
      .select(col(scoreCol), col("__cum"), col("__prev"))
    val withCum = df.join(broadcast(cum), Seq(scoreCol))
    val fullBuckets = withCum.filter(col("__cum") <= budget)
    // `__prev <= budget` (not <): a bucket starting EXACTLY at the budget
    // must still admit its zero-token prefix rows, which the naive
    // global-order cumsum (and the oracle) keeps — cum == budget passes
    val boundary = withCum
      .filter(col("__prev") <= budget && col("__cum") > budget)
      .withColumn("__run",
        sum(col(tokensCol)).over(
          Window.partitionBy(col(scoreCol)).orderBy(col(idCol))
            .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("__prev") + col("__run") <= budget)
      .drop("__run")
    fullBuckets.union(boundary).drop("__cum", "__prev")
  }

  /** Per-source document cap — the crawl-pipeline guard against one domain
    * dominating the corpus: keep at most `maxPerSource` rows per
    * `srcCol`, selected as a deterministic uniform sample (rows ranked by
    * `hash60(id, salt)`, ties by id). Equivalent to
    * `row_number() OVER (PARTITION BY source ORDER BY hash, id) <= K` —
    * but computed WITHOUT sorting whole sources.
    *
    * Scale shape (the same cum/boundary split as [[selectTokenBudget]]):
    * the hash's top 8 bits bucket each source into ≤256 ordered slices, a
    * tiny per-(source, bucket) count table decides which slices are wholly
    * kept / wholly dropped, and only the single BOUNDARY slice per
    * over-cap source pays a `row_number` sort — 1/256th of the source, so
    * a billion-doc domain sorts ~4M rows instead of 10⁹. Sources at or
    * under the cap never touch a window at all (they pass a semi-join on
    * the kept-slice table). The ordering inside a bucket extends the
    * global hash order because the bucket IS the hash's leading byte.
    */
  def capPerSource(
      df: DataFrame,
      srcCol: String,
      idCol: String,
      maxPerSource: Long,
      salt: String = "cap"): DataFrame = {
    require(maxPerSource >= 1, s"maxPerSource must be >= 1, got $maxPerSource")
    val reserved = Seq("__h", "__b", "__c", "__before", "__need", "__rn")
    require(reserved.forall(c => !df.columns.contains(c)),
      s"input columns collide with capPerSource's scratch names — rename them first")
    import org.apache.spark.sql.expressions.Window
    val withH = df
      .withColumn("__h", Sampling.hash60(col(idCol), salt))
      .withColumn("__b", floor(col("__h") / lit(1L << 52)).cast("long")) // top 8 of 60 bits
    val sliceCounts = withH.groupBy(col(srcCol), col("__b")).agg(count(lit(1)).as("__c"))
    val beforeWin = Window.partitionBy(col(srcCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cuts = sliceCounts.withColumn("__before", coalesce(sum(col("__c")).over(beforeWin), lit(0L)))
    val keepWhole = cuts
      .filter(col("__before") + col("__c") <= maxPerSource)
      .select(col(srcCol), col("__b"))
    val boundary = cuts
      .filter(col("__before") < maxPerSource && col("__before") + col("__c") > maxPerSource)
      .select(col(srcCol), col("__b"), (lit(maxPerSource) - col("__before")).as("__need"))
    val keptWhole = withH.join(keepWhole, Seq(srcCol, "__b"), "left_semi")
    val bucketWin = Window.partitionBy(col(srcCol)).orderBy(col("__h"), col(idCol))
    val keptBoundary = withH
      .join(boundary, Seq(srcCol, "__b"))
      .withColumn("__rn", row_number().over(bucketWin))
      .filter(col("__rn") <= col("__need"))
      .drop("__rn", "__need")
    keptWhole.unionByName(keptBoundary).drop("__h", "__b")
  }

  /** Per-source score calibration: append `calCol` = the row's
    * within-source percent rank of `scoreCol`, on an integer ppm grid —
    * `(rank − 1)·10⁶ div (n − 1)` with rank 1-based over the total order
    * `(scoreCol, idCol)` inside each source (a single-row source
    * calibrates to 1 000 000). Raw quality scores are not comparable
    * across sources (a classifier trained on web text scores news and
    * forums on different scales; length-based proxies shift with
    * language), so "keep the global top decile by raw score" silently
    * keeps whole sources and drops others — calibration makes one global
    * threshold mean the same thing in every source. Ties calibrate by
    * `idCol` (a total order is what makes the ppm value engine-exact and
    * retry-stable; equal scores get adjacent, not equal, ranks), and the
    * integer div keeps the grid replayable anywhere — no float
    * `percent_rank` whose `(rank−1)/(n−1)` a different engine might fuse
    * differently.
    *
    * Scale shape: NOT a `row_number() OVER (PARTITION BY source)` window —
    * that puts the largest source's entire row set in ONE task, the
    * classic 100 TB window killer (English is half the corpus). Instead
    * [[Sampling.withGlobalRank]] range-partitions on `(source, score,
    * id)` — one global rank, skew spread across the range partitions —
    * and the per-source base rank and count come from a tiny per-source
    * aggregate joined back by AQE broadcast. `scoreCol` must be non-null
    * and NaN-free (NULL ordering differs across engines; filter first).
    */
  def calibrateScores(
      df: DataFrame,
      srcCol: String,
      scoreCol: String,
      idCol: String,
      calCol: String = "cal_ppm"): DataFrame = {
    val reserved = Seq("__gr", "__base", "__n", calCol)
    require(reserved.forall(c => !df.columns.contains(c)),
      s"input columns collide with calibrateScores's scratch/output names ($reserved) — rename them first")
    val ranked = Sampling.withGlobalRank(df, Seq(srcCol, scoreCol, idCol), "__gr")
    val bounds = ranked.groupBy(col(srcCol))
      .agg(min(col("__gr")).as("__base"), count(lit(1)).as("__n"))
    ranked.join(bounds, Seq(srcCol)) // one row per source: AQE broadcasts
      .withColumn(calCol,
        // `div`, not `/` + cast: long division through a double can round
        // x.999… up before truncation and land one grid step off the
        // oracle's exact integer division
        when(col("__n") === 1, lit(1000000L))
          .otherwise(expr("(__gr - __base) * 1000000L div (__n - 1)")))
      .drop("__gr", "__base", "__n")
  }
}
