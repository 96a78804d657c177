package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics operators (batch formulations over the `events`
  * table; the same groupBy(window(...)) shapes run under Structured
  * Streaming unchanged). All outputs are integer-typed for oracle-safe
  * comparison.
  *
  * Window-function coverage beyond the A7 keeper pick (SURVEY §2.5): lag +
  * running sum for sessionization — the classic gap-based session operator
  * a training-data pipeline needs for behavioral/event corpora.
  */
object EventOps {

  /** Gap-based sessionization: a new session starts when the user's
    * inter-event gap exceeds `gapMinutes`. Adds:
    *   session_seq  - 1-based session index within the user,
    *   session_id   - deterministic global id (user_id * 1e6 + seq).
    * Deterministic ordering: (ts, event_id) within user.
    *
    * Documented bounds (shared verbatim with the ANSI oracle):
    *   - session_id is collision-free only while a user has < 1,000,000
    *     sessions (and user_id < ~9.2e12); corpora beyond that need a
    *     composite (user_id, session_seq) key instead of the packed long;
    *   - the gap compares WHOLE-SECOND epochs (unix_timestamp truncates),
    *     so sub-second timestamp components do not participate in the
    *     boundary decision — the second-granularity contract both engines
    *     implement identically. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
      .withColumn("session_id", col("user_id") * 1000000L + col("session_seq"))
      .drop("prev_ts", "new_session")
  }

  /** Per-session rollup: bounds and size of each session. The event-id
    * bounds are MIN/MAX ids (named so, like hourlyRollup's) — not the ids
    * of the temporally first/last events, which differ whenever id
    * assignment is not time-monotonic. */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"),
        unix_timestamp(min(col("ts"))).as("start_epoch"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("duration_s"))

  /** Tumbling-hour rollup by event type (epoch seconds keep the hour key
    * integer and timezone-unambiguous). */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"))
}
