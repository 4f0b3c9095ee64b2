package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucket-fingerprint table comparison — the 100 TB triage mode in front
  * of the row-level comparison engine. A full compare shuffles both tables
  * in their entirety on the primary key; at migration scale the first
  * question is cheaper: WHICH slices differ at all. Each side collapses to
  * `buckets` rows — (row count, additive sha-fingerprint) per key-hash
  * bucket — inside one map-side-combining aggregation per table, so the
  * actual comparison ships kilobytes regardless of table size and only
  * mismatching buckets go on to the row-level engine (whose key-range
  * predicate the bucket id IS: `sha_bucket(key) = b`).
  *
  * The fingerprint is engine-replicable by construction: per-row hash =
  * first 15 hex digits of sha256 over the '|'-joined string forms of the
  * columns (the same `'0x' || substr(sha256(..), 1, 15)` idiom the
  * sampling operators pin against DuckDB), bucket = key-hash mod
  * `buckets`, and the per-bucket fingerprint is the exact integer SUM of
  * row hashes in DECIMAL(38,0) — commutative (shuffle-order-proof) and
  * overflow-proof (2⁶⁰-bounded hashes × any realistic bucket population
  * stays far under 10³⁸). Column string forms are engine-stable for
  * integers, strings, and dates; floating-point columns should be
  * quantized or excluded by the caller (formatting differs across
  * engines). NULLs are encoded explicitly: every column contributes an
  * isnull flag ('0'/'1') followed by its coalesced string form, so two
  * rows that differ only in WHICH column is NULL — (k,'b',NULL) vs
  * (k,NULL,'b') — hash differently. A bare `concat_ws` would skip the
  * NULL and collapse both to the same bytes, and a triage mode that
  * reports `bucket_match=true` for such a slice silently hides a real
  * diff the row-level engine never re-checks.
  */
object Fingerprint {

  private def shaLong(s: Column): Column =
    conv(substring(sha2(s, 256), 1, 15), 16, 10).cast("long")

  /** `'1'+value` for non-null, `'0'` for null — unambiguous under concat. */
  private def tagged(c: Column): Column =
    concat(when(c.isNull, lit("0")).otherwise(lit("1")),
      coalesce(c.cast("string"), lit("")))

  /** One row per non-empty bucket: `(bucket, n_rows, fp)`. */
  def bucketFingerprints(
      df: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String],
      buckets: Int): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(buckets >= 1 && buckets <= (1 << 20), s"buckets out of range: $buckets")
    val keyStr = concat_ws("|", keyCols.map(c => tagged(col(c))): _*)
    val rowStr = concat_ws("|",
      (keyCols ++ valueCols).map(c => tagged(col(c))): _*)
    df.select(
        pmod(shaLong(keyStr), lit(buckets.toLong)).as("bucket"),
        shaLong(rowStr).as("__rh"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("__rh").cast("decimal(38,0)")).as("fp"))
  }

  /** Per-bucket verdict between two tables: `(bucket, src_rows, tgt_rows,
    * bucket_match)`. A bucket empty on one side shows 0 rows there and
    * mismatches (unless empty on both, in which case it is absent — there
    * is nothing to re-check). Buckets with `bucket_match = false` are the
    * ONLY key ranges the row-level engine needs to re-read.
    */
  def fingerprintDiff(
      src: DataFrame,
      tgt: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String],
      buckets: Int): DataFrame = {
    val s = bucketFingerprints(src, keyCols, valueCols, buckets)
      .withColumnsRenamed(Map("n_rows" -> "src_rows", "fp" -> "src_fp"))
    val t = bucketFingerprints(tgt, keyCols, valueCols, buckets)
      .withColumnsRenamed(Map("n_rows" -> "tgt_rows", "fp" -> "tgt_fp"))
    // both sides are ≤ `buckets` rows — the join is trivially broadcastable,
    // but correctness must not assume which side the planner picks
    s.join(t, Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        coalesce(col("src_rows"), lit(0L)).as("src_rows"),
        coalesce(col("tgt_rows"), lit(0L)).as("tgt_rows"),
        (col("src_rows") <=> col("tgt_rows") && col("src_fp") <=> col("tgt_fp"))
          .as("bucket_match"))
  }
}
