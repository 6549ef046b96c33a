package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operator surface over the `events` schema
  * (SURVEY.md §2.2 "Streaming: windows/watermark/state").
  *
  * Every op takes an events-shaped DataFrame — batch or streaming — and
  * returns the transformed frame, so the same definitions back the
  * streaming specs (MemoryStream) and any file-based deployment
  * (`spark.readStream.schema(...).parquet(dir)`).
  *
  * Scale notes: stateful-op shuffles are per-microbatch hash exchanges on
  * the grouping key and ride the cloud shuffle plugin unchanged; watermarks
  * bound state size, which is what makes these run indefinitely at high
  * event rates.
  */
object StreamingOps {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  case class UserStats(user_id: Long, n_events: Long, sum_value: Double,
      last_seen: Timestamp)

  /** Tumbling-window counts with a watermark bounding state. */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding-window per-type averages (1h window sliding every 15m). */
  def slidingAverages(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(avg(col("value")).as("avg_value"), count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("avg_value"), col("n_events"))

  /** Per-user sessionization: events within `gap` of each other merge into
    * one session window. */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Exactly-once-ish dedup on event_id within the watermark horizon —
    * the streaming face of the dedup north-star. */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom per-user running state via flatMapGroupsWithState: emits the
    * updated running (count, sum, last_seen) for each user touched by the
    * micro-batch.
    *
    * NoTimeout by design: a processing-time timeout makes the engine
    * schedule timeout-check batches forever even with no data, which at
    * scale is wasted cluster time (and it wedges Spark 4.1's checksum
    * checkpoint manager under rapid empty batches). Idle-state expiry
    * belongs to the watermark-driven event-time path instead. */
  def userRunningStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserStats](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserStats]) =>
          val events = batch.toSeq
          val prev = state.getOption.getOrElse(
            UserStats(userId, 0L, 0.0, new Timestamp(0)))
          val next = UserStats(
            userId,
            prev.n_events + events.length,
            prev.sum_value + events.map(_.value).sum,
            events.map(_.ts).maxBy(_.getTime))
          state.update(next)
          Iterator(next)
      }
  }
}
