package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.Constants._
import graft.config.{DatasetParams, TestParams}

/** The four comparison reports for one dataset.
  *
  * Same shape as the reference's result dict (`comparison_job.py:251-256`,
  * keys at `common_constants.py:58-61`); `cachedFrames` additionally exposes
  * every frame the pipeline persisted so long-lived sessions can release
  * them (`unpersist()`) — the reference never unpersists, which is fine for
  * a one-shot job but leaks storage in a shared session.
  */
final case class ComparisonResult(
    overallTestReport: DataFrame,
    rowLvlTestReport: DataFrame,
    colLvlTestReport: DataFrame,
    unmatchedRecords: Map[String, DataFrame],
    private[graft] val cachedFrames: Seq[DataFrame] = Seq.empty) {
  def unpersist(): Unit = cachedFrames.foreach(_.unpersist())
}

/** The comparison engine: full-outer-join source and target on the primary
  * keys, match rows via a sha256 row checksum, re-examine checksum
  * mismatches column-by-column with a numeric tolerance, and emit four
  * reports (overall / row-level / column-level / per-column unmatched
  * extracts).
  *
  * Faithful to the reference algorithm (`comparison_job.py:186-256`) and its
  * pinned semantics (SURVEY §2.10: `MISSTING_AT_TARGET` literal, M·N−1
  * row-level duplicate counts, NULL-poisoned numeric tolerance, PASSED ⇔
  * both side counts equal matched count), but re-planned Spark-first:
  *
  *  - non-key columns are derived AFTER select/drop projection, in schema
  *    order (deterministic; fixes the reference's latent crash when
  *    select/drop removes a column, `comparison_job.py:187` vs SURVEY
  *    §2.10.1 — observable behavior is unchanged on the default path);
  *  - engine construction runs exactly ONE eager job: a union of the
  *    missing/matched key aggregate (reusing the join's hash partitioning,
  *    no extra exchange), the reference's four per-side count actions
  *    (`comparison_job.py:67-84`) fused into one (side, key) aggregation,
  *    and the column-level sums (`comparison_job.py:101-118`). The overall
  *    and column-level reports are built driver-side from the collected
  *    values and the row-level report stays lazy — one pass instead of the
  *    reference's seven-plus full-table jobs;
  *  - persisted frames use MEMORY_AND_DISK and are surfaced for explicit
  *    release.
  *
  * Scale notes: the full-outer join (J1) can never broadcast — it
  * shuffle-partitions both sides by the primary keys, and every downstream
  * key-wise operator (tolerance re-join, window duplicate count, distinct)
  * reuses that hash partitioning, so the whole pipeline pays exactly one
  * wide exchange per side plus the per-report small aggregations.
  *
  * Skew: AQE skew-join splitting (enabled in [[graft.GraftSession]],
  * demonstrated in PlanSpec) engages on the splittable joins — notably the
  * tolerance fold-back LEFT join, whose big (left) side Spark can split.
  * Spark can NOT skew-split a full-outer sort-merge join (replicating
  * either side would fabricate unmatched rows), but the alignment join is
  * structurally protected: its keys are the PRIMARY keys, so a hot key can
  * only come from duplicated PKs — a data-quality defect this engine
  * exists to surface (duplicate counts in the overall/row-level reports),
  * with the same M·N cross-product cost the reference pays by definition.
  * Partition-level imbalance from hash collisions of distinct keys is
  * negligible at any corpus size.
  */
object Comparison {

  /** Reference numeric set (`comparison_job.py:14-17`): membership by
    * instance equality, so `DecimalType()` means exactly DecimalType(10, 0).
    */
  private def refNumeric(dt: DataType): Boolean = dt match {
    case d: DecimalType => d == DecimalType(10, 0)
    case _ => dt.isInstanceOf[NumericType]
  }

  private def isNumeric(dt: DataType, params: TestParams): Boolean =
    if (params.legacyDecimalComparison) refNumeric(dt)
    else dt.isInstanceOf[NumericType]

  private def isNested(dt: DataType): Boolean = dt match {
    case _: StructType | _: MapType | _: ArrayType => true
    case _ => false
  }

  /** Per-column match predicate (`comparison_job.py:19-34`): numerics match
    * within tolerance (NULL-vs-NULL numeric pairs yield NULL, kept — SURVEY
    * §2.10.4); everything else null-safe equality.
    */
  private def matchedPredicate(field: StructField, params: TestParams): Column = {
    val s = col(srcCol(field.name))
    val t = col(tgtCol(field.name))
    if (isNumeric(field.dataType, params)) {
      val withinTol = abs(s - t) <= lit(params.differenceTolerance)
      // Reference-numeric types keep the reference's exact semantics,
      // NULL-poisoning included. Decimals the reference does NOT treat as
      // numeric (any precision/scale other than (10,0)) get tolerance as a
      // graft extension — made null-safe so that at tolerance=0 the
      // predicate is exactly the reference's eqNullSafe, and at
      // tolerance>0 only the tolerance semantics differ, never NULL
      // handling (a NULL≡NULL decimal pair must not flip PASSED→FAILED).
      if (refNumeric(field.dataType)) withinTol
      else (s <=> t) || withinTol
    }
    else if (params.canonicalizeNestedTypes && isNested(field.dataType))
      to_json(s) <=> to_json(t)
    else s <=> t
  }

  /** select → drop, as the reference applies them (`comparison_job.py:38-39`). */
  private def project(df: DataFrame, params: DatasetParams): DataFrame = {
    val selected =
      if (params.selectCols == Seq("*")) df
      else df.select(params.selectCols.map(col): _*)
    if (params.dropCols.isEmpty) selected else selected.drop(params.dropCols: _*)
  }

  /** Checksum + per-side rename (`comparison_job.py:36-47`): one sha256 over
    * the concatenated non-key columns turns the N-column row match into a
    * single string compare; non-key columns get the side suffix so the
    * full-outer join only coalesces the key columns.
    */
  private def transformSide(
      df: DataFrame,
      suffix: String => String,
      nonKeyCols: Seq[String],
      params: TestParams): DataFrame = {
    val schemaByName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val chkInputs = nonKeyCols.map { c =>
      if (params.canonicalizeNestedTypes && isNested(schemaByName(c))) to_json(col(c))
      else col(c)
    }
    df.withColumn(suffix(ChkSumCol), sha2(concat_ws(EmptyStr, chkInputs: _*), 256))
      .withColumnsRenamed(nonKeyCols.map(c => c -> suffix(c)).toMap)
  }

  /** Append one `<col>_matched` boolean per non-key field and their AND-fold
    * (`comparison_job.py:49-64`).
    */
  private def withPerColumnMatches(
      unmatched: DataFrame,
      nonKeyFields: Seq[StructField],
      params: TestParams): DataFrame = {
    val withCols = unmatched
      .drop(AllRowsMatchedCol)
      .withColumns(
        nonKeyFields.map(f => matchedCol(f.name) -> matchedPredicate(f, params)).toMap)
    withCols.withColumn(
      AllRowsMatchedAfterTolCol,
      nonKeyFields
        .map(f => col(matchedCol(f.name)))
        .reduceOption(_ && _)
        .getOrElse(lit(true)))
  }

  /** Row-level report (`comparison_job.py:134-161`): per key — M·N−1
    * duplicate count over the joined cross product, missing-side status from
    * checksum nulls (a present row always has a non-null checksum), and the
    * final matched flag; `distinct` collapses identical duplicate rows.
    */
  private def rowLevelReport(
      datasetName: String,
      joined: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val keyColumns = keyCols.map(col)
    val dupWindow = Window
      .partitionBy(keyColumns: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    joined
      .select(keyColumns :+ col(srcCol(ChkSumCol)) :+ col(tgtCol(ChkSumCol)) :+ col(AllRowsMatchedCol): _*)
      .withColumn(DuplicateCountCol, count(lit(1)).over(dupWindow) - 1)
      .withColumn(
        MissingRowStatusCol,
        when(col(srcCol(ChkSumCol)).isNull, MissingAtSourceStatus)
          .when(col(tgtCol(ChkSumCol)).isNull, MissingAtTargetStatus)
          .otherwise(lit(PresentInBothStatus).cast(StringType)))
      .drop(srcCol(ChkSumCol), tgtCol(ChkSumCol))
      .distinct()
      .withColumn(DatasetNameCol, lit(datasetName))
      .select(
        col(DatasetNameCol) +: keyColumns
          :+ col(DuplicateCountCol) :+ col(MissingRowStatusCol) :+ col(AllRowsMatchedCol): _*)
  }

  /** Per-column unmatched-record extracts (`comparison_job.py:120-132`),
    * built lazily for the offending columns only (names already known from
    * the collected per-column sums — no extra action).
    */
  private def unmatchedExtracts(
      datasetName: String,
      unmatchedRecords: DataFrame,
      offending: Seq[String],
      keyCols: Seq[String]): Map[String, DataFrame] =
    offending.map { c =>
      s"$datasetName/$c" -> unmatchedRecords
        .where(!col(matchedCol(c)))
        .select((keyCols :+ srcCol(c) :+ tgtCol(c)).map(col): _*)
        .distinct()
    }.toMap

  /** Every report number in ONE Spark job: missing/matched key counts,
    * per-column mismatch sums, and per-side totals / duplicate-key counts,
    * unioned as tagged (k, map) rows and collected once.
    *
    *  - missing/matched keys and the column sums come out of ONE
    *    aggregation over `joinedRaw` with the tolerance predicates inlined
    *    (guarded by the both-present-and-checksum-mismatch condition, so
    *    they evaluate exactly where the fold-back pipeline evaluates
    *    them). The frame is already hash-partitioned by the primary keys
    *    coming out of the sort-merge join, so the per-key step reuses the
    *    join's partitioning with NO exchange. Value-identical with
    *    aggregating the folded-back frame: the fold-back join only ever
    *    multiplies rows WITHIN a key (and per-key `max` ignores
    *    multiplicity), a row is effectively matched iff its checksums
    *    match or every tolerance predicate holds (`<=> true`, matching the
    *    fold-back's null-dropping filter), and the per-column sums count
    *    exactly the after-tolerance-unmatched rows failing that column
    *    (`comparison_job.py:101-118`; a NULL-poisoned predicate counts 0,
    *    like the reference). Keeping the fold-back join OUT of the stats
    *    path saves a second pass over the joined frame — at 100 TB the
    *    eager job is one aggregation over the join output, nothing more.
    *  - the reference's four side-count actions (`comparison_job.py:67-84`)
    *    become one (side, key) aggregation: total = Σ per-key counts,
    *    dups = #keys with count > 1 — identical by construction.
    *
    * The subtrees share the persisted src/tgt/joinedRaw frames; partitions
    * raced by concurrent stages merely compute the cheap checksum
    * projection twice before the cache settles. One job replaces the
    * reference's seven-plus full-table actions — the dominant win at
    * 100 TB is that nothing here shuffles or re-joins the joined frame.
    */
  private def collectStats(
      src: DataFrame,
      tgt: DataFrame,
      joinedRaw: DataFrame,
      keyCols: Seq[String],
      nonKeyFields: Seq[StructField],
      params: TestParams): ((Long, Long, Long), (Long, Long, Long, Long), Map[String, Long]) = {
    val keyColumns = keyCols.map(col)
    val nonKeyCols = nonKeyFields.map(_.name)
    val bothPresent =
      col(srcCol(ChkSumCol)).isNotNull && col(tgtCol(ChkSumCol)).isNotNull
    val rowTolMatched = nonKeyFields
      .map(f => matchedPredicate(f, params))
      .reduceOption(_ && _)
      .getOrElse(lit(true))
    val effMatched =
      col(AllRowsMatchedCol) || (bothPresent && (rowTolMatched <=> lit(true)))
    // row ends up in unmatched_records: present on both sides, checksum
    // mismatch, and not rescued by tolerance
    val isUnmatched =
      bothPresent && !col(AllRowsMatchedCol) && !(rowTolMatched <=> lit(true))
    // "col:" prefix namespaces the per-column entries away from the fixed
    // stat keys (a dataset column could be literally named "matched")
    val perKey =
      Seq(
        max(when(col(srcCol(ChkSumCol)).isNull, 1L).otherwise(0L)).as("ms"),
        max(when(col(tgtCol(ChkSumCol)).isNull, 1L).otherwise(0L)).as("mt"),
        max(when(effMatched, 1L).otherwise(0L)).as("mm")) ++
        nonKeyFields.zipWithIndex.map { case (f, i) =>
          sum(when(isUnmatched && when(!matchedPredicate(f, params), true).otherwise(false), 1L)
            .otherwise(0L)).as(s"cs$i")
        }
    val total =
      Seq(
        coalesce(sum("ms"), lit(0L)).as("miss_src"),
        coalesce(sum("mt"), lit(0L)).as("miss_tgt"),
        coalesce(sum("mm"), lit(0L)).as("matched")) ++
        nonKeyCols.indices.map(i => coalesce(sum(s"cs$i"), lit(0L)).as(s"cs$i"))
    val matchRow = joinedRaw
      .groupBy(keyColumns: _*)
      .agg(perKey.head, perKey.tail: _*)
      .agg(total.head, total.tail: _*)
      .select(
        lit("match").as("k"),
        map(
          Seq(
            lit("miss_src"), col("miss_src"), lit("miss_tgt"), col("miss_tgt"),
            lit("matched"), col("matched")) ++
            nonKeyCols.zipWithIndex.flatMap { case (c, i) =>
              Seq(lit(s"col:$c"), col(s"cs$i"))
            }: _*).as("m"))
    val side = "_side"
    val sideRow = src
      .select(keyColumns: _*)
      .withColumn(side, lit(SourceCol))
      .union(tgt.select(keyColumns: _*).withColumn(side, lit(TargetCol)))
      .groupBy(col(side) +: keyColumns: _*)
      .count()
      .agg(
        coalesce(sum(when(col(side) === SourceCol, col(CountCol))), lit(0L)).as("src_total"),
        coalesce(sum(when(col(side) === SourceCol && col(CountCol) > 1, 1L)), lit(0L)).as("src_dups"),
        coalesce(sum(when(col(side) === TargetCol, col(CountCol))), lit(0L)).as("tgt_total"),
        coalesce(sum(when(col(side) === TargetCol && col(CountCol) > 1, 1L)), lit(0L)).as("tgt_dups"))
      .select(
        lit("side").as("k"),
        map(
          lit("src_total"), col("src_total"), lit("src_dups"), col("src_dups"),
          lit("tgt_total"), col("tgt_total"), lit("tgt_dups"), col("tgt_dups")).as("m"))
    val byK = matchRow.unionByName(sideRow).collect()
      .map(r => r.getString(0) -> r.getMap[String, Long](1))
      .toMap
    val mk = byK("match")
    val s = byK("side")
    ((mk("miss_src"), mk("miss_tgt"), mk("matched")),
      (s("src_total"), s("src_dups"), s("tgt_total"), s("tgt_dups")),
      nonKeyCols.map(c => c -> mk(s"col:$c")).toMap)
  }

  /** Overall report (`comparison_job.py:66-99`): one row of per-side
    * count/duplicate/missing maps plus PASSED ⇔ `source_count ==
    * matched_count == target_count`. Built driver-side from the collected
    * stats — no further Spark jobs.
    */
  private def overallReport(
      spark: SparkSession,
      datasetName: String,
      sideTotals: (Long, Long, Long, Long),
      missSrc: Long,
      missTgt: Long,
      matchedCount: Long): DataFrame = {
    import spark.implicits._
    val (srcTotal, srcDups, tgtTotal, tgtDups) = sideTotals
    Seq((
      datasetName,
      Map(SourceCol -> srcTotal, TargetCol -> tgtTotal),
      matchedCount,
      Map(SourceCol -> srcDups, TargetCol -> tgtDups),
      Map(SourceCol -> missSrc, TargetCol -> missTgt),
      if (srcTotal == matchedCount && tgtTotal == matchedCount) PassedStatus
      else FailedStatus))
      .toDF(DatasetNameCol, CountCol, MatchedCountCol, DuplicateCountCol,
        MissingRowsCol, TestStatusCol)
  }

  /** Column-level report (`comparison_job.py:101-118`) built driver-side
    * from the sums [[sideAndColumnStats]] already collected — one row per
    * non-key column, in schema order, zero Spark jobs.
    */
  private def columnLevelReport(
      spark: SparkSession,
      datasetName: String,
      nonKeyCols: Seq[String],
      colSums: Map[String, Long]): DataFrame = {
    import spark.implicits._
    nonKeyCols.map(c => (datasetName, c, colSums(c)))
      .toDF(DatasetNameCol, ColNameCol, UnmatchedRowsCountCol)
  }

  /** The core pipeline (`compare_dataframes`, `comparison_job.py:186-256`). */
  def compareDataFrames(
      spark: SparkSession,
      sourceDf: DataFrame,
      targetDf: DataFrame,
      params: DatasetParams): ComparisonResult = {
    val keyCols = params.primaryKeys
    val projectedSrc = project(sourceDf, params)
    val projectedTgt = project(targetDf, params)
    // Deterministic schema order, derived post-projection (SURVEY §2.10.1-2).
    val nonKeyCols = projectedSrc.columns.toSeq.filterNot(keyCols.contains)
    val nonKeyFields =
      projectedTgt.schema.fields.toSeq.filter(f => nonKeyCols.contains(f.name))

    val src = transformSide(projectedSrc, srcCol, nonKeyCols, params.testParams)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tgt = transformSide(projectedTgt, tgtCol, nonKeyCols, params.testParams)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Align the sides: the ONE unavoidable wide shuffle (J1, never
    // broadcastable). Primary row match = checksum null-safe equality.
    val joinedRaw = src
      .join(tgt, keyCols, FullOuterJoin)
      .withColumn(AllRowsMatchedCol, col(srcCol(ChkSumCol)) <=> col(tgtCol(ChkSumCol)))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Tolerance second pass over present-on-both-sides checksum mismatches
    // only — the expensive N-column compare touches just the mismatch set.
    val mismatchedPresent = joinedRaw.filter(
      !col(AllRowsMatchedCol) &&
        col(srcCol(ChkSumCol)).isNotNull &&
        col(tgtCol(ChkSumCol)).isNotNull)
    val afterTolerance =
      withPerColumnMatches(mismatchedPresent, nonKeyFields, params.testParams)

    // Fold tolerance passes back in (left join on keys reuses the join's
    // hash partitioning — no second wide shuffle of the big side).
    val joined = joinedRaw
      .join(
        afterTolerance
          .filter(col(AllRowsMatchedAfterTolCol))
          .select((keyCols :+ AllRowsMatchedAfterTolCol).map(col): _*),
        keyCols,
        LeftJoin)
      .withColumn(
        AllRowsMatchedCol,
        col(AllRowsMatchedCol) ||
          coalesce(col(AllRowsMatchedAfterTolCol), lit(false).cast(BooleanType)))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val unmatchedRecords = afterTolerance.filter(!col(AllRowsMatchedAfterTolCol))

    // ONE eager action over the RAW join builds every report number (and
    // fills the persisted src/tgt/joinedRaw chain as a side effect). The
    // fold-back join and the row-level report stay lazy — their join +
    // window + distinct run only when a caller materializes them.
    val ((missSrc, missTgt, matchedCount), sideTotals, colSums) =
      collectStats(src, tgt, joinedRaw, keyCols, nonKeyFields, params.testParams)

    val colLvl = columnLevelReport(spark, params.datasetName, nonKeyCols, colSums)
    val rowLvl = rowLevelReport(params.datasetName, joined, keyCols)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val offending = nonKeyCols.filter(c => colSums(c) > 0)
    val extracts =
      unmatchedExtracts(params.datasetName, unmatchedRecords, offending, keyCols)
    val overall =
      overallReport(spark, params.datasetName, sideTotals, missSrc, missTgt, matchedCount)

    ComparisonResult(
      overallTestReport = overall,
      rowLvlTestReport = rowLvl,
      colLvlTestReport = colLvl,
      unmatchedRecords = extracts,
      cachedFrames = Seq(src, tgt, joinedRaw, joined, rowLvl))
  }
}
