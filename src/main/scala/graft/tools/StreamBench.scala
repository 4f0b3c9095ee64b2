package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming STATE benchmark: per-micro-batch state-store rows/bytes and
  * trigger latency for the stateful operators, from
  * `StreamingQueryProgress` — the 100 TB question for a stream is state
  * GROWTH against batch count, not wall time, and the correctness rows
  * can't show it (they replay to termination and hash the sink).
  *
  * Two readouts per stateful operator:
  *   - an UNBOUNDED-lateness run (the correctness fixtures' shape): state
  *     rows must grow monotonically with input — the "never evicts"
  *     baseline;
  *   - a BOUNDED-lateness run (production shape): the watermark must hold
  *     state at a plateau once it starts advancing past old rows.
  *
  * The committed artifact (`BENCH_streaming.json`) records, per batch:
  * input rows, trigger wall, total state rows, state bytes — so a state
  * leak (eviction regression) shows as a diff in a committed JSON, the
  * same discipline as the scale ladder.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=… StreamBench [outPath]`.
  */
object StreamBench {

  private final case class BatchRow(
      batchId: Long, inputRows: Long, triggerMs: Long,
      stateRows: Long, stateBytes: Long)

  private def progressRows(q: StreamingQuery): Seq[BatchRow] =
    q.recentProgress.toSeq.map { p =>
      val ops = p.stateOperators
      BatchRow(
        p.batchId,
        p.numInputRows,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(-1L),
        ops.map(_.numRowsTotal).sum,
        ops.map(_.memoryUsedBytes).sum)
    }.sortBy(_.batchId)

  private def json(rows: Seq[BatchRow]): String =
    rows.map(r => s"""{"batch":${r.batchId},"input_rows":${r.inputRows},""" +
        s""""trigger_ms":${r.triggerMs},"state_rows":${r.stateRows},""" +
        s""""state_bytes":${r.stateBytes}}""")
      .mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.headOption.getOrElse("BENCH_streaming.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // state stores instantiate per shuffle partition per batch — size the
      // sharding to the fixture exactly like the catalog's streaming rows
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the events fixture replayed file-per-micro-batch in ts order — 8
    // range files = 8 micro-batches, enough to see growth vs plateau
    val work = java.nio.file.Files.createTempDirectory("graft-streambench").toString
    graft.sources.Events.load(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .repartitionByRange(8, col("ts"))
      .write.mode("overwrite").parquet(s"$work/src")
    val schema = spark.read.parquet(s"$work/src").schema

    def stream: DataFrame = spark.readStream
      .schema(schema).option("maxFilesPerTrigger", 1).parquet(s"$work/src")

    def run(name: String, df: DataFrame): (String, Seq[BatchRow]) = {
      val ckpt = s"$work/ckpt-$name"
      // append mode throughout: complete mode would legitimately keep every
      // window forever and mask the eviction behavior this tool measures
      val q = df.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .start()
      q.awaitTermination()
      val rows = progressRows(q)
      System.err.println(f"[streambench] $name%-24s batches=${rows.size} " +
        f"final_state_rows=${rows.lastOption.map(_.stateRows).getOrElse(0L)} " +
        f"final_state_MB=${rows.lastOption.map(_.stateBytes / 1e6).getOrElse(0.0)}%.1f")
      name -> rows
    }

    import graft.streaming.StreamingOps
    val scenarios = Seq(
      // dedup: keyed state = distinct event_ids seen. Unbounded lateness
      // never evicts (rows == total distinct keys so far); a 1-hour
      // watermark must evict keys older than the horizon as it advances.
      run("dedup_unbounded", StreamingOps.dedupEvents(stream, "90 days")),
      run("dedup_1h_watermark", StreamingOps.dedupEvents(stream, "1 hour")),
      // symmetric interval join: both sides buffer within the lateness
      // horizon; the bounded run's state must plateau, not grow linearly.
      run("join_unbounded", StreamingOps.viewsBeforePurchase(stream, "4 hours", "90 days")),
      run("join_1h_watermark", StreamingOps.viewsBeforePurchase(stream, "4 hours", "1 hour")),
      // windowed aggregation: state = open windows; 1-hour windows with a
      // bounded watermark close behind the stream.
      run("windowed_unbounded", StreamingOps.windowedStats(stream, "1 hour", "90 days")),
      run("windowed_1h_watermark", StreamingOps.windowedStats(stream, "1 hour", "1 hour")),
      // custom flatMapGroupsWithState sessionization: per-user open-session
      // state with an event-time timeout — the one stateful operator whose
      // eviction is the OPERATOR's own timeout logic, not a built-in
      // watermark rule, so its growth-vs-plateau behavior needs its own row
      run("sessionize_30m_gap",
        StreamingOps.sessionizeEvents(spark, stream,
          gapUs = 1800000000L, lateness = "1 hour").toDF()))

    val body = scenarios.map { case (n, rows) => s""""$n":${json(rows)}""" }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"stream_state","unit":"rows/bytes/ms","sf":"$sfDir",""" +
      s""""scenarios":$body}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    spark.stop()
    println(line)
  }
}
