package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the event stream: windowed
  * aggregation with watermarks, stateful within-watermark deduplication,
  * and custom per-key state via mapGroupsWithState.
  *
  * All transforms are source-agnostic: feed them `readStream` (files,
  * Kafka, rate) or a batch DataFrame with the same schema — the plan is
  * identical, which is how the batch oracle in [[graft.Queries]] validates
  * the same logic the stream runs. State stores partition by the grouping
  * key, so a 1000-executor cluster shards watermark state horizontally.
  */
object StreamingOps {

  /** Tumbling-window event counts + value sums per event type.
    * With a watermark, late events beyond `lateness` are dropped and the
    * state store stays bounded — the standing-agg memory is
    * O(open windows × event types), independent of stream length.
    */
  def windowedStats(events: DataFrame, windowLength: String, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Exactly-once-style stream dedup: drop events whose `event_id` was
    * already seen within the watermark horizon (bounded state).
    */
  def dedupEvents(events: DataFrame, lateness: String): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: left-join each micro-batch against a
    * broadcast dimension table. Left join — enrichment must never DROP an
    * event (unmatched rows keep NULL dimension columns); the broadcast
    * hint keeps the stream side stateless and shuffle-free (no watermark
    * or join state needed, unlike stream-stream joins). Note Spark does
    * not re-list file-based static sides between micro-batches — for a
    * slowly-changing dimension, restart the query or use a dimension
    * format with refreshable listing.
    */
  def enrichEvents(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** Per-user session windows via Spark's native `session_window`: events
    * of one user merge into a session while each arrives within `gap` of
    * the session's end; the window closes `gap` after the last event.
    * Pass `lateness` when the input is a stream — the watermark lets the
    * state store evict closed sessions and append-mode emit them.
    *
    * `total_value` is summed in fixed-point micros (exact, order-
    * independent — see q_agg_pricing) so the result is deterministic under
    * any partitioning and replicable in external SQL (the q_events_sessions
    * oracle rebuilds the same sessions with a lag/cumsum gap split).
    */
  def sessionWindows(
      events: DataFrame,
      gap: String,
      lateness: Option[String] = None): DataFrame = {
    val base = lateness.map(l => events.withWatermark("ts", l)).getOrElse(events)
    base
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 1e6).cast("long")) / 1e6).as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
  }

  /** One closed session per output row. */
  final case class Session(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, total_value: Double)
  /** Internal sessionization accumulator (public only for the state
    * encoder's generated code, which can't reach a private constructor).
    */
  final case class SessAcc(startUs: Long, lastUs: Long, n: Long, qv: Long)

  /** Custom-state sessionization via flatMapGroupsWithState: the streaming
    * twin of [[sessionWindows]] for semantics `session_window` can't
    * express (here: emit CLOSED sessions only, exactly once, with an
    * event-time timeout so idle users' sessions flush when the watermark
    * passes their gap horizon). State is one small accumulator per user —
    * sharded by the grouping key across executors.
    */
  def sessionizeEvents(
      spark: SparkSession,
      events: DataFrame,
      gapUs: Long,
      lateness: String): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", lateness)
      // the watermarked `ts` attribute must reach the stateful operator for
      // EventTimeTimeout to resolve — keep it alongside the derived fields
      .select(
        col("user_id").as[Long],
        col("ts").as[java.sql.Timestamp],
        unix_micros(col("ts")).as[Long],
        round(col("value") * 1e6).cast("long").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessAcc, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long)], state: GroupState[SessAcc]) =>
          var closed = List.empty[Session]
          if (state.hasTimedOut) {
            val a = state.get
            closed ::= Session(user, a.startUs, a.lastUs + gapUs, a.n, a.qv / 1e6)
            state.remove()
            closed.iterator
          } else {
            var acc = state.getOption
            rows.toSeq.sortBy(_._3).foreach { case (_, _, us, qv) =>
              acc match {
                case Some(a) if us - a.lastUs < gapUs =>
                  // min/max (not `a.startUs`/`us`): a row older than the
                  // restored state — cross-batch disorder after a restart —
                  // must widen the session, never move lastUs backwards
                  acc = Some(SessAcc(math.min(a.startUs, us), math.max(a.lastUs, us),
                    a.n + 1, a.qv + qv))
                case Some(a) =>
                  closed ::= Session(user, a.startUs, a.lastUs + gapUs, a.n, a.qv / 1e6)
                  acc = Some(SessAcc(us, us, 1L, qv))
                case None =>
                  acc = Some(SessAcc(us, us, 1L, qv))
              }
            }
            acc.foreach { a =>
              state.update(a)
              // flush once the watermark is `gap` past the last event — but
              // never BEHIND the current watermark: after a restart the
              // watermark may have advanced past a stale session's horizon,
              // and Spark rejects a timeout below it, killing the query on
              // every restart attempt. Clamping flushes such sessions at the
              // next watermark tick instead.
              state.setTimeoutTimestamp(
                math.max((a.lastUs + gapUs) / 1000, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** Stream-stream interval join — the streaming twin of
    * [[graft.operators.Temporal.rangeJoin]]: each purchase matches the same
    * user's view events in the `before`-long window ending at the purchase
    * (inclusive both ends). Watermarks on BOTH sides let Spark bound the
    * join buffers: a side's state evicts once the other side's watermark
    * passes the interval bound, so state is O(rate × (before + lateness))
    * regardless of stream length — exactly the property a 100 TB/day
    * stream needs. Inner join, so matches emit as soon as both rows have
    * arrived (no watermark-close latency).
    *
    * Works identically on a batch frame (same plan), which is how the spec
    * and the `q_events_range` oracle family validate it.
    */
  def viewsBeforePurchase(events: DataFrame, before: String, lateness: String): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", lateness)
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("value").as("view_value"))
      .withWatermark("v_ts", lateness)
    purchases
      .join(views, expr(
        s"user_id = v_user AND v_ts >= p_ts - INTERVAL $before AND v_ts <= p_ts"))
      .select("purchase_id", "user_id", "p_ts", "v_ts", "view_value")
  }

  /** Per-user running session stats held in custom state. */
  final case class UserStat(user_id: Long, n_events: Long, total_value: Double)
  /** Internal running-stats accumulator (public only for the state
    * encoder's generated code, which can't reach a private constructor —
    * same constraint as [[SessAcc]]).
    */
  final case class Acc(n: Long, total: Double)

  def userRunningStats(spark: SparkSession, events: DataFrame): Dataset[UserStat] = {
    import spark.implicits._
    events.select(col("user_id").as[Long], col("value").as[Double])
      .groupByKey(_._1)
      .mapGroupsWithState[Acc, UserStat](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Acc]) =>
          val prev = state.getOption.getOrElse(Acc(0L, 0.0))
          val next = rows.foldLeft(prev) { case (a, (_, v)) => Acc(a.n + 1, a.total + v) }
          state.update(next)
          UserStat(user, next.n, next.total)
      }
  }

  /** Continuously materialize a keyed SNAPSHOT from a CDC stream: each
    * micro-batch merges into the parquet snapshot at `snapshotPath` via
    * [[graft.operators.Changelog.applyChangelog]] — `foreachBatch`, the
    * streaming→batch bridge for sinks with no native upsert.
    *
    * Exactly-once without a transactional table format: the merge is
    * IDEMPOTENT (re-applying a batch already folded into the snapshot
    * changes nothing — latest-per-key collapse makes replacement and
    * delete replay-safe), so a checkpoint-restart replaying the last batch
    * converges to the same snapshot. The swap is crash-windowed three-step
    * (write `.tmp`, current → `.bak`, `.tmp` → live, drop `.bak`) and
    * [[readSnapshot]] falls back to `.bak` when a crash between renames
    * left no live directory — every crash point resumes to a consistent
    * snapshot + replayed batch. Production stacks with Iceberg/Delta get
    * the atomic commit from the format instead; this keeps the operator
    * format-agnostic.
    *
    * Scale: per micro-batch cost is one latest-per-key collapse of the
    * batch (small) + one co-partitioned merge join against the snapshot —
    * AQE broadcasts the collapsed batch, so the snapshot rewrite is the
    * dominant cost, as it is for any copy-on-write table format.
    */
  def upsertSink(
      stream: DataFrame,
      snapshotPath: String,
      checkpointDir: String,
      keys: Seq[String],
      orderCols: Seq[String],
      opCol: String,
      deleteOp: String = "D",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val snapshotSchema = org.apache.spark.sql.types.StructType(
      stream.schema.filterNot(_.name == opCol))
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val snap = readSnapshot(spark, snapshotPath).getOrElse(
          spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
            snapshotSchema))
        val merged = graft.operators.Changelog.applyChangelog(
          snap, batch.toDF(), keys, orderCols, opCol, deleteOp)
        val fs = new org.apache.hadoop.fs.Path(snapshotPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val live = new org.apache.hadoop.fs.Path(snapshotPath)
        val tmp = new org.apache.hadoop.fs.Path(snapshotPath + ".tmp")
        val bak = new org.apache.hadoop.fs.Path(snapshotPath + ".bak")
        merged.write.mode("overwrite").parquet(tmp.toString) // old snap fully read here
        // HDFS-family FileSystems signal rename/delete failure by returning
        // false, not throwing. A swallowed false here would let foreachBatch
        // return normally, commit the batch in the checkpoint, and strand the
        // merged output in .tmp — silent loss. Throw so the batch retries.
        def must(ok: Boolean, step: String): Unit =
          if (!ok) throw new java.io.IOException(
            s"upsertSink snapshot swap failed at: $step (batch will retry)")
        // Recovery-before-swap: a crash between the two renames left live
        // absent with .bak as the ONLY committed generation (the one this
        // batch's merge just read through readSnapshot's fallback). Restore
        // it to live FIRST — deleting .bak while live is absent would leave
        // no committed generation at all, and a crash before tmp->live then
        // loses every key not present in the replayed batch.
        if (!fs.exists(live) && fs.exists(bak)) must(fs.rename(bak, live), s"restore $bak -> $live")
        if (fs.exists(bak)) must(fs.delete(bak, true), s"delete stale $bak")
        if (fs.exists(live)) must(fs.rename(live, bak), s"rename $live -> $bak")
        must(fs.rename(tmp, live), s"rename $tmp -> $live")
        fs.delete(bak, true) // best-effort: a leftover .bak is cleaned next batch
        ()
      }
      .start()
  }

  /** The live snapshot written by [[upsertSink]], falling back to the
    * `.bak` generation if a crash landed between the two swap renames.
    * None before the first batch commits.
    */
  def readSnapshot(spark: SparkSession, snapshotPath: String): Option[DataFrame] = {
    val conf = spark.sparkContext.hadoopConfiguration
    Seq(snapshotPath, snapshotPath + ".bak")
      .find(p => new org.apache.hadoop.fs.Path(p).getFileSystem(conf)
        .exists(new org.apache.hadoop.fs.Path(p)))
      .map(spark.read.parquet(_))
  }
}
