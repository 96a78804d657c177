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

  test("hourly rollup buckets by event-time hour") {
    val h = EventOps.hourlyRollup(events).collect()
      .map(r => (r.getAs[Long]("hour_epoch"), r.getAs[String]("event_type")) -> r.getAs[Long]("cnt")).toMap
    assert(h((0L, "click")) == 5L) // all five events inside hour 0 (UTC epoch)
  }
}
