package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader for the `events` table. The physical `ts` encoding has shipped in
  * two generations of the testdata:
  *
  *  - **TIMESTAMP(MICROS)** (current) — Spark's native resolution; read
  *    directly.
  *  - **raw INT64 epoch-nanos** (legacy TIMESTAMP(NANOS) payloads, and the
  *    [[graft.tools.GenScale]] output) — a type Spark's parquet reader
  *    rejects outright ([PARQUET_TYPE_ILLEGAL]); read with an explicit
  *    LongType schema, which maps the INT64 physical values through
  *    unchanged, then truncate to µs.
  *
  * [[load]] sniffs the footer schema and normalizes both to the same shape:
  * `ts` as a µs-precision TimestampType plus `ts_ns` as epoch-nanos (the
  * fixed-point column the exact-arithmetic queries use).
  */
object Events {
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val columns = Seq("event_id", "ts_ns", "user_id", "event_type", "value", "props", "ts")

  /** Rename raw nanos to `ts_ns` and add the µs-precision `ts`. Applies to
    * batch and streaming frames alike (same plan both ways).
    */
  def decorate(df: DataFrame): DataFrame =
    df.withColumnRenamed("ts", "ts_ns")
      // Integer `div`, not `/`: Spark's `/` is double division, and epoch
      // nanos (~1.7e18) exceed double's 53-bit mantissa — the truncation
      // must stay exact or window/watermark boundaries drift by ~1µs.
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))

  /** True iff the inference failure is the specific unsupported-parquet-type
    * rejection a TIMESTAMP(NANOS) footer produces (Spark 4 raises the
    * [PARQUET_TYPE_ILLEGAL] / "Illegal Parquet type" family from the footer
    * converter). Checked down the cause chain because the reader wraps it.
    */
  private def isNanosRejection(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).exists { t =>
      val m = Option(t.getMessage).getOrElse("")
      m.contains("PARQUET_TYPE_ILLEGAL") || m.contains("Illegal Parquet type") ||
        m.contains("PARQUET_TYPE_NOT_SUPPORTED") || m.contains("Unsupported parquet type")
    }

  def load(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    // Footer sniff: inferring the schema of a TIMESTAMP(NANOS) file throws
    // ([PARQUET_TYPE_ILLEGAL]-family), which is the signal to take the
    // raw-long path. µs files load as TIMESTAMP or (isAdjustedToUTC=false)
    // TIMESTAMP_NTZ; the session timezone is pinned to UTC, so the
    // NTZ→TIMESTAMP cast is the identity on the physical µs value — the
    // same instant DuckDB's epoch_ns sees. Any OTHER ts shape is a real
    // error and must surface: silently routing, say, a renamed-column file
    // through the explicit LongType schema would fill ts with NULLs and
    // quietly empty every event query.
    scala.util.Try(spark.read.parquet(path)) match {
      case scala.util.Success(df) =>
        df.schema.fields.find(_.name == "ts").map(_.dataType) match {
          case Some(TimestampType) | Some(TimestampNTZType) =>
            df.withColumn("ts", col("ts").cast(TimestampType))
              .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
              .select(columns.map(col): _*)
          case Some(LongType) => // raw epoch-nanos (GenScale output)
            decorate(df).select(columns.map(col): _*)
          case other => throw new IllegalArgumentException(
            s"$path: expected a timestamp or INT64-nanos 'ts' column, found $other")
        }
      case scala.util.Failure(e) if isNanosRejection(e) =>
        // NANOS footer rejected at inference — the legacy-generation signal
        decorate(spark.read.schema(rawSchema).parquet(path))
          .select(columns.map(col): _*)
      case scala.util.Failure(e) =>
        // Anything else (corrupt footer, missing file in a glob, IO error)
        // is a REAL failure: retrying it under the explicit LongType schema
        // would at best re-fail confusingly and at worst misread — surface
        // the original exception instead.
        throw e
    }
  }
}
