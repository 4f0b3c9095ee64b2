package graft

import java.nio.file.Files

import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._

import graft.sources.Events

/** The events reader must normalize BOTH physical generations of the table
  * — native TIMESTAMP(MICROS)/NTZ files and raw INT64 epoch-nanos files —
  * to the same (ts timestamp, ts_ns bigint) shape with identical values.
  * Regression for the testdata generation that switched encodings and
  * silently compressed event time 1000× through the nanos-assuming path.
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  test("native-µs and raw-nanos events files load to identical rows") {
    val native = Events.load(spark, "/root/testdata/sf0.001")
    // re-write the same data as the legacy layout: raw INT64 nanos in `ts`
    val tmp = Files.createTempDirectory("graft-events-gen").toString
    native.select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val legacy = Events.load(spark, tmp)

    assert(legacy.schema == native.schema,
      s"generations must converge on one schema:\n${legacy.schema}\nvs\n${native.schema}")
    val n = native.select("event_id", "ts_ns").as[(Long, Long)].collect().toMap
    val l = legacy.select("event_id", "ts_ns").as[(Long, Long)].collect().toMap
    assert(n == l, "ts_ns must be identical across generations")

    // the µs timestamp is the ns value truncated — and lands in a sane
    // decade (the 1000×-compression bug put everything in January 1970)
    val (tsUs, tsNs) = native.select(unix_micros(col("ts")), col("ts_ns"))
      .as[(Long, Long)].head()
    assert(tsUs == tsNs / 1000L)
    val tsYear = native.select(functions.year(col("ts"))).as[Int].head()
    assert(tsYear >= 2000, s"event timestamps decode to $tsYear — unit mismatch")
  }
}
