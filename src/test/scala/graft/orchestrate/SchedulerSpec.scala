package graft.orchestrate

import java.time.{Duration, Instant}

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{SourceConfig, SourceType}

/** O8 scheduled trigger: pure due-time calculus against pinned
  * instants — no clocks, no sleeps. Semantics under test are the
  * scheduler-expression family the reference config declares
  * (`rate(1 hour)`) plus the cron subset, and the catch-up contract
  * (missed periods collapse to one fire, never a replay backlog).
  */
class SchedulerSpec extends AnyFunSuite {

  private val t0 = Instant.parse("2026-01-01T00:00:00Z")
  private def cfg(name: String, sched: String) = SourceConfig(
    name = name, sourceType = SourceType.File, schedule = Some(sched))

  test("rate() parses the reference grammar and rejects junk") {
    assert(Schedule.parse("rate(1 hour)") == Schedule.Rate(Duration.ofHours(1)))
    assert(Schedule.parse("rate(15 minutes)") == Schedule.Rate(Duration.ofMinutes(15)))
    assert(Schedule.parse("rate(2 days)") == Schedule.Rate(Duration.ofDays(2)))
    intercept[IllegalArgumentException](Schedule.parse("rate(0 hours)"))
    intercept[IllegalArgumentException](Schedule.parse("every 5 minutes"))
    intercept[IllegalArgumentException](Schedule.parse("cron(1 2 3)"))
  }

  test("rate(15 minutes): fires on the anchor grid, collapses missed periods") {
    val s = Schedule.parse("rate(15 minutes)")
    assert(s.nextFire(t0, t0) == t0.plus(Duration.ofMinutes(15)))
    assert(!s.isDue(t0, None, t0.plusSeconds(600)), "10 min in: not due")
    assert(s.isDue(t0, None, t0.plusSeconds(900)), "15 min in: due")
    // After firing at t0+15, the next due time is t0+30 even if the
    // fire itself happened late (anchor grid, not fire-relative).
    val late = t0.plus(Duration.ofMinutes(22))
    assert(s.nextFire(t0, late) == t0.plus(Duration.ofMinutes(30)))
  }

  test("cron(0 12 * * ? *): daily at noon, day-of-week numbering is cron's") {
    val s = Schedule.parse("cron(0 12 * * ? *)")
    assert(s.nextFire(t0, t0) == Instant.parse("2026-01-01T12:00:00Z"))
    assert(s.nextFire(t0, Instant.parse("2026-01-01T12:00:00Z")) ==
      Instant.parse("2026-01-02T12:00:00Z"))
    // 2026-01-04 is a Sunday → cron day-of-week 1.
    val sun = Schedule.parse("cron(30 6 ? * 1 *)")
    assert(sun.nextFire(t0, t0) == Instant.parse("2026-01-04T06:30:00Z"))
    // Steps and ranges.
    val q = Schedule.parse("cron(*/20 9-10 * * ? *)")
    assert(q.nextFire(t0, Instant.parse("2026-01-01T09:25:00Z")) ==
      Instant.parse("2026-01-01T09:40:00Z"))
    assert(q.nextFire(t0, Instant.parse("2026-01-01T10:45:00Z")) ==
      Instant.parse("2026-01-02T09:00:00Z"))
  }

  test("cron steps expand from each field's own minimum (standard cron semantics)") {
    // Day-of-month */5 = days 1,6,11,… (not multiples of 5).
    val dom = Schedule.parse("cron(0 0 */5 * ? *)")
    assert(dom.nextFire(t0, t0) == Instant.parse("2026-01-06T00:00:00Z"))
    // Month */3 = Jan,Apr,Jul,Oct (not Mar,Jun,Sep,Dec).
    val mon = Schedule.parse("cron(0 0 1 */3 ? *)")
    assert(mon.nextFire(t0, Instant.parse("2026-01-15T00:00:00Z")) ==
      Instant.parse("2026-04-01T00:00:00Z"))
    // Day-of-week */2 = Sun,Tue,Thu,Sat (cron 1,3,5,7). 2026-01-02 is
    // a Friday, so the next match is Saturday the 3rd.
    val dow = Schedule.parse("cron(0 0 ? * */2 *)")
    assert(dow.nextFire(t0, Instant.parse("2026-01-02T01:00:00Z")) ==
      Instant.parse("2026-01-03T00:00:00Z"))
    // Year steps expand over the real year range — */4 from 1970 lands
    // on 2026 (1970 + 14·4), so this fires rather than scanning 500
    // days of minutes and throwing.
    val yr = Schedule.parse("cron(0 0 1 1 ? */4)")
    assert(yr.nextFire(t0, t0) == Instant.parse("2030-01-01T00:00:00Z"))
  }

  test("tick fires due sources once, skips unscheduled, keeps per-source state") {
    val sources = Seq(cfg("fast", "rate(15 minutes)"), cfg("slow", "rate(1 hour)"),
      SourceConfig(name = "unscheduled", sourceType = SourceType.File))
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    // Registration tick: anchors bind, nothing due yet.
    val (s1, f1) = Scheduler.tick(sources, Scheduler.State(), t0, c => ran += c.name)
    assert(f1.isEmpty && ran.isEmpty)
    // 20 min: only the 15-minute source fires.
    val (s2, f2) = Scheduler.tick(sources, s1, t0.plusSeconds(1200), c => ran += c.name)
    assert(f2 == Seq("fast") && ran.toSeq == Seq("fast"))
    // 65 min, after a long gap: BOTH fire exactly once — three elapsed
    // fast periods collapse into one fire (no replay).
    val (s3, f3) = Scheduler.tick(sources, s2, t0.plusSeconds(3900), c => ran += c.name)
    assert(f3.toSet == Set("fast", "slow"))
    assert(ran.count(_ == "fast") == 2)
    assert(s3.lastFire("fast") == t0.plusSeconds(3900))
  }
}
