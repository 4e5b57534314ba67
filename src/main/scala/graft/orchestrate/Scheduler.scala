package graft.orchestrate

import java.time.{Duration, Instant, ZoneOffset, ZonedDateTime}

import graft.config.SourceConfig

/** O8: the scheduled trigger (`sample_source.yaml:26` declares
  * `schedule: "rate(1 hour)"`). The reference delegates firing to its
  * cloud scheduler; the engine-side analog is this pure due-time
  * calculus plus a [[Scheduler.tick]] loop any orchestrator (cron, a
  * driver thread, an external scheduler) can call. Everything is
  * deterministic and clock-injected — the spec replays schedules
  * against pinned instants, no sleeps.
  *
  * Supported grammar is the scheduler-expression family the reference
  * config uses: `rate(N minute|minutes|hour|hours|day|days)` and a
  * 5/6-field `cron(min hour day-of-month month day-of-week [year])`
  * subset with `*`, `?`, lists `a,b`, ranges `a-b`, and star-slash-n
  * steps (field values numeric; names like MON are out of declared
  * scope).
  */
sealed trait Schedule {
  /** The first fire time strictly after `after`, given the schedule's
    * anchor (rate schedules fire at anchor + k·period; cron schedules
    * ignore the anchor).
    */
  def nextFire(anchor: Instant, after: Instant): Instant

  /** Catch-up semantics of a real scheduler: missed periods COLLAPSE —
    * a tick observing several elapsed due times fires once, it does
    * not replay the backlog.
    */
  final def isDue(anchor: Instant, lastFire: Option[Instant], now: Instant): Boolean =
    !nextFire(anchor, lastFire.getOrElse(anchor)).isAfter(now)
}

object Schedule {

  final case class Rate(period: Duration) extends Schedule {
    def nextFire(anchor: Instant, after: Instant): Instant = {
      if (!after.isAfter(anchor)) return anchor.plus(period)
      val elapsed = Duration.between(anchor, after)
      val k = elapsed.toMillis / period.toMillis
      anchor.plus(period.multipliedBy(k + 1))
    }
  }

  /** One cron field: the set of permitted values (None = any). */
  final case class CronField(allowed: Option[Set[Int]]) {
    def matches(v: Int): Boolean = allowed.forall(_.contains(v))
  }

  final case class Cron(
      minute: CronField, hour: CronField, dayOfMonth: CronField,
      month: CronField, dayOfWeek: CronField, year: CronField) extends Schedule {

    private def dateMatches(t: ZonedDateTime): Boolean =
      dayOfMonth.matches(t.getDayOfMonth) && month.matches(t.getMonthValue) &&
        // Cron day-of-week: 1 = Sunday … 7 = Saturday (EventBridge
        // numbering); java.time: 1 = Monday … 7 = Sunday.
        dayOfWeek.matches(t.getDayOfWeek.getValue % 7 + 1) &&
        year.matches(t.getYear)

    def nextFire(anchor: Instant, after: Instant): Instant = {
      // Day-granular walk with field-wise pruning: non-matching days
      // cost one probe each (not 1,440 minute probes), and within a
      // matching day only the allowed hour×minute grid is enumerated —
      // so even a single-year-constrained schedule decades out
      // resolves in at most ~84k cheap probes. Exhausting the year
      // range means the schedule can never fire again; surface loudly.
      var t = after.atZone(ZoneOffset.UTC).withSecond(0).withNano(0).plusMinutes(1)
      while (t.getYear <= YearMax) {
        if (dateMatches(t)) {
          var h = t.getHour
          while (h <= 23) {
            if (hour.matches(h)) {
              var m = if (h == t.getHour) t.getMinute else 0
              while (m <= 59) {
                if (minute.matches(m)) return t.withHour(h).withMinute(m).toInstant
                m += 1
              }
            }
            h += 1
          }
        }
        t = t.toLocalDate.plusDays(1).atStartOfDay(ZoneOffset.UTC)
      }
      throw new IllegalStateException(
        s"cron schedule has no fire time after $after within the supported year range (≤ $YearMax)")
    }
  }

  private val RatePattern = """rate\(\s*(\d+)\s*(minute|minutes|hour|hours|day|days)\s*\)""".r
  private val CronPattern = """cron\(\s*([^)]+)\s*\)""".r

  def parse(expr: String): Schedule = expr.trim match {
    case RatePattern(n, unit) =>
      val amount = n.toLong
      require(amount > 0, s"rate() requires a positive interval: $expr")
      Rate(unit match {
        case "minute" | "minutes" => Duration.ofMinutes(amount)
        case "hour" | "hours"     => Duration.ofHours(amount)
        case _                    => Duration.ofDays(amount)
      })
    case CronPattern(body) =>
      val fields = body.trim.split("\\s+")
      require(fields.length == 5 || fields.length == 6,
        s"cron() takes 5 or 6 fields, got ${fields.length}: $expr")
      def field(i: Int, min: Int, max: Int): CronField =
        if (i >= fields.length) CronField(None) else parseField(fields(i), min, max)
      Cron(
        field(0, 0, 59), field(1, 0, 23), field(2, 1, 31),
        field(3, 1, 12), field(4, 1, 7), field(5, YearMin, YearMax))
    case other =>
      throw new IllegalArgumentException(s"Unsupported schedule expression: $other")
  }

  // EventBridge's documented year range; also bounds the nextFire scan.
  private val YearMin = 1970
  private val YearMax = 2199

  /** Steps expand over the FIELD's own range starting at its minimum —
    * `*\/5` in day-of-month is days 1,6,11,…, month `*\/3` is
    * Jan/Apr/Jul/Oct — matching standard cron/EventBridge semantics
    * (a step is shorthand for `min-max/n`), not multiples of n.
    */
  private def parseField(f: String, min: Int, max: Int): CronField = f match {
    case "*" | "?" => CronField(None)
    case s if s.startsWith("*/") =>
      val step = s.drop(2).toInt
      require(step > 0, s"cron step must be positive: $f")
      CronField(Some((min to max by step).toSet))
    case s =>
      CronField(Some(s.split(',').flatMap { part =>
        part.split('-') match {
          case Array(a)    => Seq(a.trim.toInt)
          case Array(a, b) => a.trim.toInt to b.trim.toInt
          case _ => throw new IllegalArgumentException(s"Bad cron field: $f")
        }
      }.toSet))
  }
}

object Scheduler {

  /** Tick state: when each source was registered (the rate anchor) and
    * when it last fired.
    */
  final case class State(
      anchors: Map[String, Instant] = Map.empty,
      lastFire: Map[String, Instant] = Map.empty) {
    def register(name: String, at: Instant): State =
      if (anchors.contains(name)) this else copy(anchors = anchors + (name -> at))
  }

  /** One orchestrator tick over every scheduled source: fire the ones
    * whose next due time has passed, record the fire instants, skip
    * unscheduled sources. `run` is the injected effect (typically
    * `PipelineRunner.run` partially applied); failures propagate to
    * the caller's retry/notify policy — the scheduler only decides
    * WHEN, mirroring the reference's split between its scheduler and
    * its workflow.
    */
  def tick(
      cfgs: Seq[SourceConfig],
      state: State,
      now: Instant,
      run: SourceConfig => Unit): (State, Seq[String]) = {
    val fired = Seq.newBuilder[String]
    var st = state
    for (cfg <- cfgs; expr <- cfg.schedule) {
      st = st.register(cfg.name, now)
      val sched = Schedule.parse(expr)
      if (sched.isDue(st.anchors(cfg.name), st.lastFire.get(cfg.name), now)) {
        run(cfg)
        fired += cfg.name
        st = st.copy(lastFire = st.lastFire + (cfg.name -> now))
      }
    }
    (st, fired.result())
  }
}
