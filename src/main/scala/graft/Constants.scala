package graft

/** Column names, join types, report directory names and status literals of
  * the comparison engine.
  *
  * Mirrors the reference's public vocabulary
  * (`spark_data_test/constants/common_constants.py:1-67`) so that report
  * schemas and written directory layouts are drop-in compatible.
  */
object Constants {
  val ParquetFmt = "parquet"
  val EmptyStr = ""
  val OverwriteMode = "overwrite"
  /** Sentinel file_format meaning "read a catalog table" (common_constants.py:4). */
  val TableFmt = "table"

  // join types (common_constants.py:7-11)
  val InnerJoin = "inner"
  val LeftJoin = "left"
  val FullOuterJoin = "full_outer"
  /** Graft extension: the mismatch-refetch prune (not a reference join type). */
  val LeftSemiJoin = "left_semi"

  // per-side column suffixes (common_constants.py:13-16)
  def srcCol(name: String): String = s"${name}_src"
  def tgtCol(name: String): String = s"${name}_target"
  def matchedCol(name: String): String = s"${name}_matched"
  val MatchedSuffix = "_matched"

  // common col names (common_constants.py:19-20)
  val ChkSumCol = "_chk_sum"
  val CountCol = "count"
  /** Graft extension (internal, never reported): per-key "some joined pair
    * already checksum-matched" flag riding the mismatch refetch — needed to
    * count tolerance rescues exactly once per key under duplicated PKs.
    */
  val ChkMatchedKeyCol = "_chk_matched_key"

  // overall test report (common_constants.py:24-34)
  val DatasetNameCol = "dataset_name"
  val MatchedCountCol = "matched_count"
  val MissingRowsCol = "missing_rows"
  val DuplicateCountCol = "duplicate_count"
  val SourceCol = "source"
  val TargetCol = "target"
  val TestStatusCol = "test_status"
  val PassedStatus = "PASSED"
  val FailedStatus = "FAILED"

  // column level report (common_constants.py:37-38)
  val ColNameCol = "column_name"
  val UnmatchedRowsCountCol = "unmatched_rows_count"

  // row level report (common_constants.py:41-47)
  val AllRowsMatchedCol = "all_rows_matched"
  val AllRowsMatchedAfterTolCol = "all_rows_matched_after_tolerance"
  val MissingRowStatusCol = "missing_row_status"
  val MissingAtSourceStatus = "MISSING_AT_SOURCE"
  /** The typo is canon (common_constants.py:46) — written reports must match
    * the reference's byte-for-byte.
    */
  val MissingAtTargetStatus = "MISSTING_AT_TARGET"
  val PresentInBothStatus = "PRESENT_IN_BOTH"

  // extension (not in the reference): normalized row-report key column —
  // the per-dataset primary-key columns collapsed to one JSON string so
  // heterogeneous-PK datasets can consolidate (normalize_row_keys flag)
  val KeyJsonCol = "key_json"

  // output report directories (common_constants.py:50-55)
  val OverallTestReportDir = "overall_test_report"
  val ColLvlTestReportDir = "col_lvl_test_report"
  val RowLvlTestReportDir = "row_lvl_test_report"
  def unmatchedRowsDir(colName: String): String = s"unmatched_rows/$colName"
}
