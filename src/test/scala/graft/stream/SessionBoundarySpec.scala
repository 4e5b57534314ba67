package graft.stream

import java.sql.Timestamp

import graft.SparkTestBase

/** Pins the exact-gap session boundary semantics of all three session
  * encodings — the case fixture jitter previously avoided. An event
  * arriving EXACTLY `gap` after the previous one MERGES everywhere:
  *
  *  - `session_window` (event_sessions): merges touching windows
  *    (observed empirically — this drove the alignment);
  *  - StatefulSessions fold: inclusive `<=` merge;
  *  - gaps-and-islands oracle: strict `>` break.
  *
  * The spec makes any engine-version drift in the boundary rule loud
  * and proves the three-way agreement on boundary/inside/outside rows.
  */
class SessionBoundarySpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: two events exactly 30 min apart (THE boundary), then one
  // 29:59.999 after (inside), then one 30:00.001 after (outside).
  private def events = {
    val s = spark; import s.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0),       // exactly gap after #1
      (2L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-01 10:29:59.999"), 2.0),   // inside the gap
      (3L, ts("2024-01-01 10:00:00"), 1.0),
      (3L, ts("2024-01-01 10:30:00.001"), 2.0))   // outside the gap
      .toDF("user_id", "ts", "value")
  }

  private def sessionsPerUser(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.collect().groupBy(_.getAs[Long]("user_id")).map { case (u, rs) => u -> rs.length }

  test("session_window merges at the exact-gap boundary") {
    val n = sessionsPerUser(EventWindows.sessionByUser(events, "30 minutes"))
    assert(n(1L) == 1, s"session_window merges touching windows: ${n(1L)}")
    assert(n(2L) == 1, "inside the gap always merges")
    assert(n(3L) == 2, "outside the gap always breaks")
  }

  test("stateful fold merges at the exact gap — aligned with session_window") {
    val n = sessionsPerUser(
      StatefulSessions.sessionsBatch(events, "30 minutes"))
    assert(n(1L) == 1, "inclusive <= fold: exactly-gap event extends the session")
    assert(n(2L) == 1)
    assert(n(3L) == 2)
  }

  test("gaps-and-islands oracle rule (strict > breaks) on the same rows") {
    events.createOrReplaceTempView("boundary_events")
    val gi = spark.sql(
      """WITH d AS (SELECT user_id, ts,
        |  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |            > INTERVAL 30 MINUTE
        |       OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |       THEN 1 ELSE 0 END AS brk FROM boundary_events),
        |s AS (SELECT user_id,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sess FROM d)
        |SELECT user_id, sess, count(*) AS n FROM s GROUP BY 1, 2""".stripMargin)
    val n = gi.collect().groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.length }
    assert(n(1L) == 1, "oracle rule: exact gap merges")
    assert(n(2L) == 1)
    assert(n(3L) == 2)
  }

  test("all three encodings emit identical session rows on the boundary fixture") {
    val viaWindow = EventWindows.sessionByUser(events, "30 minutes")
      .collect().map(_.toSeq).toSet
    val viaState = StatefulSessions.sessionsBatch(events, "30 minutes")
      .collect().map(_.toSeq).toSet
    assert(viaState == viaWindow, "fold and session_window must agree row-for-row")
  }
}
