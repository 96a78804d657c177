package graft

import java.sql.Timestamp

import graft.events.EventOps

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, minute: Double): (Long, Timestamp, Long, String, Double, String) =
    (id, new Timestamp((minute * 60000).toLong), user, "click", 1.0, """{"k": 1}""")

  private val events = Seq(
    ev(0, 1, 0), ev(1, 1, 10), ev(2, 1, 45), // user 1: gap 35min -> 2 sessions
    ev(3, 2, 5), // user 2: single session
    ev(4, 1, 46) // user 1: same session as event 2
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("gap-based sessionization splits on >30min gaps") {
    val s = EventOps.sessionize(events, 30).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    assert(s(0) == s(1)) // 10min gap: same session
    assert(s(0) != s(2)) // 35min gap: new session
    assert(s(2) == s(4)) // 1min gap: same session
    assert(s(0) == 1000001L && s(2) == 1000002L && s(3) == 2000001L)
  }

  test("session stats aggregate bounds and durations") {
    val stats = EventOps.sessionStats(events, 30).collect()
      .map(r => r.getAs[Long]("session_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("min_event_id"),
          r.getAs[Long]("max_event_id"), r.getAs[Long]("duration_s"))).toMap
    assert(stats(1000001L) == ((2L, 0L, 1L, 600L)))
    assert(stats(1000002L) == ((2L, 2L, 4L, 60L)))
    assert(stats(2000001L) == ((1L, 3L, 3L, 0L)))
  }

  test("gap boundary is strict: exactly gapMinutes stays in-session") {
    // user 7: events at 0 and exactly 30min — NOT > 30*60s, same session;
    // user 8: 30min + 1s — strictly over, new session.
    val df = Seq(
      ev(10, 7, 0), ev(11, 7, 30),
      ev(12, 8, 0), (13L, new Timestamp(30 * 60000L + 1000L), 8L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val s = df.transform(EventOps.sessionize(_, 30)).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    assert(s(10) == s(11), "exactly-30min gap must stay in the same session")
    assert(s(12) != s(13), "30min+1s gap must open a new session")
  }

  test("sub-second components do not participate in the gap decision") {
    // Documented contract: unix_timestamp truncates to whole seconds, so a
    // gap of 30min + 999ms is 30min at second granularity — same session.
    val df = Seq(
      ev(20, 9, 0),
      (21L, new Timestamp(30 * 60000L + 999L), 9L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val s = df.transform(EventOps.sessionize(_, 30)).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    assert(s(20) == s(21), "truncated-second gap of exactly 30min stays in-session")
  }

  test("equal timestamps order deterministically by event_id") {
    // Two events at the identical ts: the (ts, event_id) window order makes
    // lag/new_session deterministic regardless of partitioning. Event 31
    // (same ts as 30) must never start a session; the NEXT event after a
    // 31-min gap must.
    val df = Seq(
      ev(30, 11, 0), ev(31, 11, 0), ev(32, 11, 31)
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = df.repartition(7).transform(EventOps.sessionize(_, 30)).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("session_seq"), r.getAs[Long]("session_id"))).toMap
    assert(rows(30) == ((1L, 11000001L)))
    assert(rows(31) == ((1L, 11000001L)))
    assert(rows(32) == ((2L, 11000002L)))
  }

  test("hourly rollup buckets by event-time hour") {
    val h = EventOps.hourlyRollup(events).collect()
      .map(r => (r.getAs[Long]("hour_epoch"), r.getAs[String]("event_type")) -> r.getAs[Long]("cnt")).toMap
    assert(h((0L, "click")) == 5L) // all five events inside hour 0 (UTC epoch)
  }
}
