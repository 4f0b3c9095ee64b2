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

  /** Per-user running session stats held in custom state. */
  final case class UserStat(user_id: Long, n_events: Long, total_value: Double)
  private final case class Acc(n: Long, total: Double)

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
}
