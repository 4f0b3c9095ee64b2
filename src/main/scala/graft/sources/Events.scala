package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader for the `events` table, whose `ts` column is a parquet
  * TIMESTAMP(NANOS) — a type Spark's parquet reader rejects outright
  * ([PARQUET_TYPE_ILLEGAL]). Reading with an explicit LongType schema maps
  * the INT64 physical values through unchanged; `ts` is then exposed both
  * as raw nanos (`ts_ns`) and as a microsecond-precision TimestampType
  * (`ts`, truncated — Spark's native resolution).
  */
object Events {
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Rename raw nanos to `ts_ns` and add the µs-precision `ts`. Applies to
    * batch and streaming frames alike (same plan both ways).
    */
  def decorate(df: DataFrame): DataFrame =
    df.withColumnRenamed("ts", "ts_ns")
      // Integer `div`, not `/`: Spark's `/` is double division, and epoch
      // nanos (~1.7e18) exceed double's 53-bit mantissa — the truncation
      // must stay exact or window/watermark boundaries drift by ~1µs.
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))

  def load(spark: SparkSession, sfDir: String): DataFrame =
    decorate(spark.read.schema(rawSchema).parquet(s"$sfDir/events.parquet"))
}
