package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Funnel semantics (q65): the one-exchange running-min window form must
  * agree with the literal sequential definition (min-per-step join-back
  * cascade — the oracle's shape) on fixtures built to break it.
  */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def ev(rows: (Long, Long, Long, String)*): DataFrame =
    rows.map { case (id, u, t, ty) => (id, u, ts(t), ty) }
      .toDF("event_id", "user_id", "ts", "event_type")

  /** The literal definition, step by step: earliest step-i event strictly
    * after the user's earliest qualifying step i-1 (and within the
    * deadline of it when `maxGapSeconds` is set). */
  private def funnelByJoins(events: DataFrame, steps: Seq[String],
      maxGapSeconds: Option[Long] = None): Seq[Long] = {
    val head = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t"))
    val perStep = steps.drop(1).scanLeft(head) { (prev, step) =>
      val within = maxGapSeconds.fold(lit(true))(g =>
        col("ts") <= col("t") + expr(s"INTERVAL $g SECOND"))
      events.filter(col("event_type") === step)
        .join(prev, "user_id")
        .filter(col("ts") > col("t") && within)
        .groupBy("user_id").agg(min("ts").as("t"))
    }
    perStep.map(_.count())
  }

  test("funnel matches the sequential join-cascade on an adversarial fixture") {
    // user 1: clean view(10) -> click(20) -> purchase(30): full depth.
    // user 2: click BEFORE any view, plus a same-ts click (ties don't
    //   advance) — only the view counts.
    // user 3: purchase before the qualifying click; a later purchase
    //   qualifies. An EARLIER non-first view exists after the click too:
    //   strictly-after compares against the EARLIEST view.
    // user 4: no view at all — contributes to no step.
    // user 5: view only.
    val events = ev(
      (1, 1, 10, "view"), (2, 1, 20, "click"), (3, 1, 30, "purchase"),
      (4, 2, 5, "click"), (5, 2, 10, "view"), (6, 2, 10, "click"),
      (7, 3, 10, "view"), (8, 3, 15, "purchase"), (9, 3, 20, "click"),
      (10, 3, 18, "view"), (11, 3, 25, "purchase"),
      (12, 4, 10, "click"), (13, 4, 20, "purchase"),
      (14, 5, 10, "view"), (15, 5, 5, "error"))
    val row = EventOps.funnel(events).collect().head
    assert(Seq(row.getLong(0), row.getLong(1), row.getLong(2)) == Seq(4L, 2L, 2L))
    assert(row.getDouble(3) == 0.5 && row.getDouble(4) == 1.0)
    assert(funnelByJoins(events, Seq("view", "click", "purchase")) ==
      Seq(4L, 2L, 2L))
  }

  test("funnel agrees with the join-cascade on a randomized log and 4 steps") {
    val steps = Seq("view", "click", "signup", "purchase")
    val rnd = new scala.util.Random(7)
    val types = steps ++ Seq("error")
    val events = ev((1L to 600L).map(i =>
      (i, rnd.nextInt(25).toLong, rnd.nextInt(50).toLong,
        types(rnd.nextInt(types.size)))): _*)
    val row = EventOps.funnel(events, steps).collect().head
    val got = steps.indices.map(i => row.getLong(i))
    assert(got == funnelByJoins(events, steps))
  }

  test("windowed funnel: the deadline binds to the CHOSEN step time, no restart") {
    // user 1: click at +30 within the 3600s window, purchase at +5000
    //   after the CLICK's deadline -> depth 2.
    // user 2: first click lands outside the view's window; a purchase
    //   right after that click must NOT count (the funnel never restarts
    //   from a non-qualifying step) -> depth 1.
    // user 3: full chain, every hop inside its window -> depth 3.
    val events = ev(
      (1, 1, 0, "view"), (2, 1, 30, "click"), (3, 1, 5000, "purchase"),
      (4, 2, 0, "view"), (5, 2, 4000, "click"), (6, 2, 4010, "purchase"),
      (7, 3, 0, "view"), (8, 3, 100, "click"), (9, 3, 200, "purchase"))
    val steps = Seq("view", "click", "purchase")
    val row = EventOps.funnel(events, steps, maxGapSeconds = Some(3600L))
      .collect().head
    val got = steps.indices.map(row.getLong)
    assert(got == Seq(3L, 2L, 1L), s"got $got")
    assert(got == funnelByJoins(events, steps, Some(3600L)))
    // randomized equivalence with a tight window forcing many stalls
    val rnd = new scala.util.Random(11)
    val types = steps ++ Seq("error")
    val big = ev((1L to 600L).map(i =>
      (i, rnd.nextInt(25).toLong, rnd.nextInt(50000).toLong,
        types(rnd.nextInt(types.size)))): _*)
    val r2 = EventOps.funnel(big, steps, maxGapSeconds = Some(900L))
      .collect().head
    assert(steps.indices.map(r2.getLong) ==
      funnelByJoins(big, steps, Some(900L)))
    intercept[IllegalArgumentException] {
      EventOps.funnel(events, steps, maxGapSeconds = Some(0L))
    }
  }

  test("funnel rejects degenerate step lists") {
    val events = ev((1, 1, 10, "view"))
    intercept[IllegalArgumentException] { EventOps.funnel(events, Seq("view")) }
    intercept[IllegalArgumentException] {
      EventOps.funnel(events, Seq("view", "view"))
    }
  }

  test("funnelLatency: per-transition count/min/max/sum and ranked lower median") {
    // view->click latencies: u1 10s, u2 20s, u3 8s -> n=3, median = 2nd
    //   smallest = 10s; click->purchase: u1 30s, u3 1s -> n=2, lower
    //   median = 1s. u4 views only. All values integer microseconds.
    val events = ev(
      (1, 1, 10, "view"), (2, 1, 20, "click"), (3, 1, 50, "purchase"),
      (4, 2, 5, "view"), (5, 2, 25, "click"),
      (6, 3, 0, "view"), (7, 3, 8, "click"), (8, 3, 9, "purchase"),
      (9, 4, 10, "view"))
    val got = EventOps.funnelLatency(events)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val M = 1000000L
    assert(got(("view", "click")) ==
      (("view", "click", 3L, 8 * M, 20 * M, 38 * M, 10 * M)))
    assert(got(("click", "purchase")) ==
      (("click", "purchase", 2L, 1 * M, 30 * M, 31 * M, 1 * M)))
  }

  test("funnelLatency counts exactly the users funnel counts, under the deadline too") {
    val rnd = new scala.util.Random(11)
    val types = Seq("view", "click", "purchase", "error")
    val events = ev((1L to 400L).map(i =>
      (i, rnd.nextInt(20).toLong, rnd.nextInt(2000).toLong,
        types(rnd.nextInt(types.size)))): _*)
    for (gap <- Seq(None, Some(300L))) {
      val fr = EventOps.funnel(events, maxGapSeconds = gap).collect().head
      val lat = EventOps.funnelLatency(events, maxGapSeconds = gap)
        .as[(String, String, Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(lat.getOrElse(("view", "click"), 0L) == fr.getLong(1))
      assert(lat.getOrElse(("click", "purchase"), 0L) == fr.getLong(2))
      // the deadline bounds every surviving latency
      gap.foreach { g =>
        val mx = EventOps.funnelLatency(events, maxGapSeconds = gap)
          .as[(String, String, Long, Long, Long, Long, Long)].collect()
          .map(_._5).max
        assert(mx <= g * 1000000L)
      }
    }
  }

  test("funnelLatency adds only the tiny transition exchange to funnel's one") {
    val events = ev((1, 1, 10, "view"), (2, 1, 20, "click"),
      (3, 1, 30, "purchase"))
    val plan = EventOps.funnelLatency(events)
      .queryExecution.executedPlan.toString
    // the event table pays its one user_id exchange; the ranked-median
    // window and the final agg share one (step_from, step_to) exchange of
    // the user-granular table; never a global sort
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length == 1, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("funnel shuffles the event table exactly once") {
    val events = ev((1, 1, 10, "view"), (2, 1, 20, "click"),
      (3, 1, 30, "purchase"))
    val plan = EventOps.funnel(events).queryExecution.executedPlan.toString
    // one hash exchange for the per-user window+agg chain, one single-row
    // global reduce; no range exchange (no global sort) ever.
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("retention matches the literal join form on a multi-week fixture") {
    val week = 7L * 86400L
    // users 1,2 start week 0 (1 returns weeks 1 and 3, 2 never returns);
    // user 3 starts week 1 and returns week 2; user 4 has two events in
    // the SAME week (must dedup to one active user-week).
    val events = ev(
      (1, 1, 10, "view"), (2, 1, week + 5, "click"), (3, 1, 3 * week + 9, "view"),
      (4, 2, 20, "view"),
      (5, 3, week + 30, "view"), (6, 3, 2 * week + 30, "purchase"),
      (7, 4, 40, "view"), (8, 4, 50, "click"))
    val got = EventOps.retention(events)
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    // Literal form, computed independently here.
    val firsts = events.groupBy("user_id").agg(min("ts").as("t0"))
    val want = events.join(firsts, "user_id")
      .select(col("user_id"),
        date_trunc("week", col("t0")).cast("date").as("cohort_week"),
        (datediff(date_trunc("week", col("ts")).cast("date"),
          date_trunc("week", col("t0")).cast("date")) / 7).cast("int")
          .as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset").count()
      .orderBy("cohort_week", "week_offset")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
    // Structure checks the fixture was built to force: user 4's same-week
    // events collapse (cohort of users 1/2/4 has 3 users at offset 0),
    // and user 1 is absent at offset 2 (a retention GAP, not a cumsum).
    val byKey = got.map { case (c, o, n) => (c, o) -> n }.toMap
    val cohort0 = got.head._1
    assert(byKey((cohort0, 0)) == 3L)
    assert(!byKey.contains((cohort0, 2)))
    assert(byKey((cohort0, 3)) == 1L)
  }

  test("retention shuffles the event table once; the dedup adds no exchange") {
    val events = ev((1, 1, 10, "view"), (2, 1, 20, "click"),
      (3, 2, 30, "purchase"))
    val plan = EventOps.retention(events).queryExecution.executedPlan.toString
    // one corpus-sized hash exchange on user_id (the window); the distinct
    // rides it (subset clustering); one low-cardinality exchange for the
    // final (cohort_week, week_offset) count; nothing else.
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length == 1, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("rollingActives matches a literal trailing-window count") {
    val day = 86400L
    // user 1 active days 0,3,8; user 2 days 0,1; user 3 day 8 twice (same
    // user-day must not double-count); day 8's window [2..8] must NOT see
    // days 0-1, and days 4-7 have no events so no output rows exist.
    val events = ev(
      (1, 1, 10, "view"), (2, 1, 3 * day + 5, "click"), (3, 1, 8 * day + 1, "view"),
      (4, 2, 20, "view"), (5, 2, day + 30, "click"),
      (6, 3, 8 * day + 40, "view"), (7, 3, 8 * day + 50, "click"))
    val got = EventOps.rollingActives(events)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got == Map(
      "1970-01-01" -> 2L, // users 1,2 on day 0
      "1970-01-02" -> 2L, // day 1: user 2 new, user 1 still in window
      "1970-01-04" -> 2L, // day 3: users 1,2 (days 0-1 within 7)
      "1970-01-09" -> 2L)) // day 8: window [day 2..8] -> users 1,3 only
    assert(got.size == 4) // no rows for event-less days
  }

  test("rollingActives broadcasts the day set; no global sort") {
    val events = ev((1, 1, 10, "view"), (2, 2, 20, "click"))
    val plan = EventOps.rollingActives(events)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("changeIntervals collapses runs: gaps-and-islands semantics") {
    // user 1: view,view | click | view  -> 4 events, 3 intervals (the
    // second view run is a NEW interval, not merged with the first);
    // user 2: single run, open-ended (null valid_to).
    val events = ev(
      (1, 1, 10, "view"), (2, 1, 20, "view"), (3, 1, 30, "click"),
      (4, 1, 40, "view"),
      (5, 2, 50, "purchase"), (6, 2, 60, "purchase"))
    val got = EventOps.changeIntervals(events)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime / 1000,
        Option(r.getTimestamp(3)).map(_.getTime / 1000), r.getLong(4)))
      .sortBy(r => (r._1, r._3))
    assert(got.toSeq == Seq(
      (1L, "view", 10L, Some(30L), 2L),
      (1L, "click", 30L, Some(40L), 1L),
      (1L, "view", 40L, None, 1L),
      (2L, "purchase", 50L, None, 2L)))
  }

  test("changeIntervals runs in ONE exchange: windows, agg, and lead share it") {
    val events = ev((1, 1, 10, "view"), (2, 1, 20, "click"))
    val plan = EventOps.changeIntervals(events)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length == 1, plan)
  }

  test("rollingActivesApprox tracks the exact count within HLL tolerance") {
    // ~2000 user-days over 20 days, enough for the ~1.6% (lgK=12) sketch
    // error to be exercised against a 5% assertion band.
    val rnd = new scala.util.Random(11)
    val events = ev((1L to 4000L).map(i =>
      (i, rnd.nextInt(500).toLong, rnd.nextInt(20).toLong * 86400L + 30L,
        "view")): _*)
    val exact = EventOps.rollingActives(events)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val approx = EventOps.rollingActivesApprox(events)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet) // same day coverage rule
    exact.foreach { case (day, n) =>
      assert(math.abs(approx(day) - n) <= math.max(2L, (n * 0.05).toLong),
        s"day $day exact=$n approx=${approx(day)}")
    }
  }

  test("rollingActivesApprox sketches per day before any wide step") {
    val events = ev((1, 1, 10, "view"), (2, 2, 86400L + 5, "click"))
    val plan = EventOps.rollingActivesApprox(events)
      .queryExecution.executedPlan.toString
    // the raw log meets ONE exchange, carrying daily sketches (partial
    // hll_sketch_agg map-side); everything after is calendar-sized
    assert(plan.contains("hll_sketch_agg"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("topSessionPaths orders within session and ranks deterministically") {
    val gap = 100L
    // user 1, session A: out-of-event-id-order inserts still path by ts;
    // session B starts after the gap. user 2 repeats the view>click path
    // so it outranks everything; a tie between two 1-count paths breaks
    // by path string.
    val events = ev(
      (2, 1, 20, "click"), (1, 1, 10, "view"),
      (3, 1, 500, "purchase"),
      (4, 2, 10, "view"), (5, 2, 30, "click"),
      (6, 2, 800, "view"), (7, 2, 820, "click"))
    val got = EventOps.topSessionPaths(events, gapSeconds = gap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("view>click", 3L), ("purchase", 1L)))
  }

  test("topSessionPaths: path agg rides the session exchange; top-k is TakeOrdered") {
    // k must be BELOW the fixture's known row bound: on a LocalRelation the
    // optimizer proves maxRows <= k and eliminates the limit entirely,
    // leaving a bare global Sort — so pin with k = 1 over 2 rows.
    val events = ev((1, 1, 10, "view"), (2, 2, 20, "click"))
    val plan = EventOps.topSessionPaths(events, k = 1)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length == 1, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("keySkewReport ranks hot keys with exact shares") {
    // user 1: 4 rows, user 2: 2, users 3/4: 1 each — k=3 cuts user 4 via
    // the (n_rows desc, key asc) tie-break.
    val events = ev(
      (1, 1, 10, "view"), (2, 1, 20, "view"), (3, 1, 30, "click"),
      (4, 1, 40, "view"),
      (5, 2, 50, "view"), (6, 2, 60, "click"),
      (7, 3, 70, "view"), (8, 4, 80, "view"))
    val got = EventOps.keySkewReport(events, "user_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 4L, 0.5), (2L, 2L, 0.25), (3L, 1L, 0.125)))
  }

  test("keySkewReport reuses the key-count exchange for the total") {
    val events = ev((1, 1, 10, "view"), (2, 2, 20, "click"),
      (3, 3, 30, "view"))
    val df = EventOps.keySkewReport(events, "user_id", k = 2)
    df.collect() // AQE dedupes the twin exchange at RUNTIME, not in the
    // static plan — materialize first, then read the final adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan)
    // the key-count exchange is planned once and REUSED by the 1-row
    // total branch; the total joins back broadcast-nested-loop (1 row),
    // and the top-k is TakeOrdered — never a rangepartitioning
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  test("attribution credits the strictly-preceding touch, 'none' if absent") {
    // user 1: view(10) click(20) purchase(30) -> click gets the credit;
    //   a second purchase(40) with no new touch ALSO credits click.
    // user 2: purchase(10) before any touch -> none; then a view and a
    //   purchase at the SAME ts where the view has the smaller event_id,
    //   so row order makes it strictly preceding -> view gets the credit.
    // user 3: error events never take credit.
    val events = ev(
      (1, 1, 10, "view"), (2, 1, 20, "click"), (3, 1, 30, "purchase"),
      (4, 1, 40, "purchase"),
      (5, 2, 10, "purchase"), (6, 2, 20, "view"), (7, 2, 20, "purchase"),
      (8, 3, 10, "error"), (9, 3, 20, "purchase"))
    val got = EventOps.attribution(events)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("click" -> 2L, "view" -> 1L, "none" -> 2L))
    intercept[IllegalArgumentException] {
      EventOps.attribution(events, touchTypes = Seq("purchase"))
    }
  }

  test("attribution is ONE exchange — the as-of credit join never materializes") {
    val events = ev((1, 1, 10, "view"), (2, 1, 20, "purchase"))
    val plan = EventOps.attribution(events)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length == 1, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  /** dailyAnomaly fixture: `counts(d)` events of type `typ` on day d. */
  private def dailyEvents(typ: String, counts: Seq[(Int, Int)],
      idBase: Long): DataFrame = {
    val rows = counts.flatMap { case (day, cnt) =>
      (0 until cnt).map(i =>
        (idBase + day * 1000L + i, 1L, ts(day * 86400L + i), typ))
    }
    rows.toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  test("dailyAnomaly: full-baseline spike flags, variance-0 and short-history rows stay null") {
    // type "t": 7 baseline days (8,12,10,10,10,10,10 -> mean 10,
    // var 8/7 > 0), then a 20-count spike day and a calm 10-count day.
    // type "flat": constant 5 -> variance 0 on its scored days -> z null.
    val events = dailyEvents("t",
      Seq(1 -> 8, 2 -> 12, 3 -> 10, 4 -> 10, 5 -> 10, 6 -> 10, 7 -> 10,
        8 -> 20, 9 -> 10), 0L)
      .union(dailyEvents("flat", (1 to 9).map(_ -> 5), 100000L))
    val out = EventOps.dailyAnomaly(events).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), Option(r.get(5)).map(_ => r.getDouble(5)),
        r.getBoolean(6)))
    val t = out.filter(_._1 == "t").sortBy(_._2)
    // days 1-7: baseline shorter than 7 observed days -> never scored
    assert(t.take(7).forall(r => r._5.isEmpty && !r._6),
      "short-history days must not score")
    val spike = t(7); val calm = t(8)
    assert(spike._3 == 20L && spike._4 == 7L)
    assert(spike._5.exists(_ > 3.0) && spike._6, s"spike day must flag: $spike")
    // calm day's baseline slid to (12,10,10,10,10,10,20): mean > 10, so a
    // 10-count day sits below it — negative z, never a spike
    assert(calm._5.exists(_ < 0.0) && !calm._6, s"calm day must not flag: $calm")
    val flat = out.filter(_._1 == "flat").sortBy(_._2)
    assert(flat.forall(r => r._5.isEmpty && !r._6),
      "zero-variance baselines must not score")
  }

  test("dailyAnomaly is two exchanges: the daily rollup, then the per-type window") {
    val events = dailyEvents("t", Seq(1 -> 2, 2 -> 3), 0L)
    val plan = EventOps.dailyAnomaly(events)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
  }

  private val Day = 86400L

  private def evv(rows: (Long, Long, Long, Double)*): DataFrame =
    rows.map { case (id, u, t, v) => (id, u, ts(t), v) }
      .toDF("event_id", "user_id", "ts", "value")

  test("decayScore: per-user anchor, halving weights, zero beyond the cap") {
    val events = evv(
      (1, 1, 10 * Day + Day / 2, 2.0),  // anchor: age 0, weight 2^15
      (2, 1, 9 * Day + Day / 2, 1.5),   // exactly 1 day older: weight 2^14
      (3, 1, -10 * Day + Day / 2, 9.9), // age 20 >= cap: weight 0, still counted
      (4, 2, 3 * Day, 0.5))             // lone event: score == its own value
    val got = EventOps.decayScore(events)
      .as[(Long, Long, Long, Timestamp, Double)].collect()
      .map(r => r._1 -> r).toMap
    // user 1: (2000*2^15 + 1500*2^14) / (1000*2^15) = 2.0 + 0.75
    assert(got(1L)._2 == 3L && got(1L)._3 == 2L)
    assert(got(1L)._5 == 2.75, s"hand-computed decay sum: ${got(1L)}")
    assert(got(1L)._4 == ts(10 * Day + Day / 2))
    // a user's most recent event always carries full weight — the per-user
    // anchor makes the lone event's score its own value
    assert(got(2L)._5 == 0.5 && got(2L)._3 == 1L)
  }

  test("decayScore: all-age-0 events degenerate to sum of milli-floored values") {
    val events = evv((1, 7, 100, 1.25), (2, 7, 100, 2.5), (3, 7, 100, 0.125))
    val got = EventOps.decayScore(events)
      .select(col("decay_score")).as[Double].head()
    assert(got == (1250L + 2500L + 125L) / 1000.0)
  }

  test("decayScore matches an independent BigInt reference on a randomized log") {
    val rnd = new scala.util.Random(88)
    val rows = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(6).toLong + 1,
        rnd.nextInt(40).toLong * Day / 2 + rnd.nextInt(1000), // half-day grid + jitter
        math.floor(rnd.nextDouble() * 2000) / 100)            // exact centi-values
    }
    val got = EventOps.decayScore(evv(rows: _*))
      .select(col("user_id"), col("decay_score"))
      .as[(Long, Double)].collect().toMap
    // reference: exact integer arithmetic end to end, one final division
    val expected = rows.groupBy(_._2).map { case (u, es) =>
      val anchor = es.map(_._3).max
      val raw = es.map { e =>
        val age = (anchor - e._3) / Day // whole days, integer floor
        if (age < 16)
          BigInt(math.floor(e._4 * 1000).toLong) * BigInt(1L << (15 - age).toInt)
        else BigInt(0)
      }.sum
      u -> raw.toDouble / 32768000.0
    }
    assert(got == expected, "the operator must equal the literal definition")
  }

  test("decayScore is ONE exchange: the window anchor and the agg share it") {
    val events = evv((1, 1, 10, 1.0), (2, 1, 20, 2.0))
    val plan = EventOps.decayScore(events)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length == 1, plan)
  }

  test("labelMode: majority wins, ties go to the lexicographically smallest") {
    val events = ev(
      (1, 1, 10, "b"), (2, 1, 20, "a"), (3, 1, 30, "a"), (4, 1, 40, "b"),
      (5, 2, 10, "c"), (6, 2, 20, "c"), (7, 2, 30, "c"), (8, 2, 40, "b"))
    val got = EventOps.labelMode(events)
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "a", 2L, 4L, 0.5)), s"tie must break to 'a': ${got(1L)}")
    assert(got(2L) == ((2L, "c", 3L, 4L, 0.75)))
  }

  test("labelMode plans two hash aggs, no window, no join") {
    val events = ev((1, 1, 10, "a"), (2, 1, 20, "b"))
    val plan = EventOps.labelMode(events).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
  }

  test("sessionCooccurrence: presence not volume, within-session pairs only") {
    val events = ev(
      // user 1, session 1: types a,b,a,c -> pairs (a,b),(a,c),(b,c)
      (1, 1, 100, "a"), (2, 1, 200, "b"), (3, 1, 300, "a"), (4, 1, 400, "c"),
      // user 1, session 2 (gap > 6h): a,b -> (a,b) again
      (5, 1, 100 + 8 * 3600, "a"), (6, 1, 200 + 8 * 3600, "b"),
      // user 2: singleton-type session contributes nothing
      (7, 2, 100, "a"))
    val got = EventOps.sessionCooccurrence(events)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 1L))
  }

  test("gapHistogram: power-of-two buckets with exact integer bounds") {
    val events = ev(
      (1, 1, 100, "a"), (2, 1, 100, "a"),   // gap 0  -> bucket 0 [0, 0]
      (3, 1, 101, "a"),                      // gap 1  -> bucket 1 [1, 2]
      (4, 1, 104, "a"),                      // gap 3  -> bucket 2 [3, 6]
      (5, 1, 111, "a"),                      // gap 7  -> bucket 3 [7, 14]
      (6, 1, 118, "a"),                      // gap 7  -> bucket 3 again
      (7, 1, 200, "b"), (8, 2, 300, "b"))    // different type/user: no gap
    val got = EventOps.gapHistogram(events)
      .as[(String, Int, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == Map(
      ("a", 0) -> ((0L, 0L, 1L)),
      ("a", 1) -> ((1L, 2L, 1L)),
      ("a", 2) -> ((3L, 6L, 1L)),
      ("a", 3) -> ((7L, 14L, 2L))), got.toString)
  }

  test("gapHistogram: one corpus exchange for the lag, histogram-sized agg") {
    val events = ev((1, 1, 100, "a"), (2, 1, 200, "a"))
    val plan = EventOps.gapHistogram(events)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length == 1, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
  }

  test("burstScore: exact trailing-window max, edges inclusive, per-user isolation") {
    val events = ev(
      // user 1: 3 events inside one 60s window (t=0,30,59 — 59s span,
      // inclusive edges), then a lone event far away
      (1, 1, 0, "a"), (2, 1, 30, "a"), (3, 1, 59, "a"), (4, 1, 1000, "a"),
      // user 2: two events exactly 60s apart — OUTSIDE a 60s trailing
      // window (range is [t-59, t]), so max burst stays 1
      (5, 2, 0, "a"), (6, 2, 60, "a"))
    val got = EventOps.burstScore(events, windowSeconds = 60L, threshold = 3L)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 3L, true)), got(1L).toString)
    assert(got(2L) == ((2L, 2L, 1L, false)),
      "a gap equal to the window must not count as inside it")
  }

  test("burstScore matches a brute-force trailing-window reference on a randomized log") {
    // pins the r11 difference-of-running-sums rewrite beyond the oracle:
    // heavy same-second duplication (RANGE peers) and window-edge gaps
    val rnd = new scala.util.Random(955)
    val rows = (1 to 400).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(120).toLong, "a"))
    val w = 30L
    val got = EventOps.burstScore(ev(rows: _*), windowSeconds = w, threshold = 4L)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val expected = rows.groupBy(_._2).map { case (u, es) =>
      val secs = es.map(_._3)
      val maxBurst = secs.map(s => secs.count(t => t > s - w && t <= s)).max
      u -> ((es.size.toLong, maxBurst.toLong, maxBurst >= 4L))
    }
    assert(got == expected, "the cumsum rewrite must equal the literal sliding count")
  }

  test("burstScore is ONE exchange: range window and agg share user_id") {
    val events = ev((1, 1, 10, "a"), (2, 1, 20, "a"))
    val plan = EventOps.burstScore(events)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length == 1, plan)
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }

  test("freshness: self-anchored trailing day, inclusive span, rate division") {
    val events = ev(
      // type a: 3 events over 2 days + 1s; only the last is inside ITS
      // trailing day (the others are exactly >= 24h older than the anchor)
      (1, 1, 0, "a"), (2, 2, Day, "a"), (3, 3, 2 * Day + 1, "a"),
      // type b: a single event — span 1 day, per_day = its count
      (4, 4, 500, "b"))
    val got = EventOps.freshness(events)
      .select(col("event_type"), col("n_events"), col("n_last_day"),
        col("span_days"), col("per_day"))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 3L, 1L, 3L, 1.0)), got("a").toString)
    assert(got("b") == (("b", 1L, 1L, 1L, 1.0)))
  }

  test("freshness is ONE exchange: the per-type anchor shares the agg's hash") {
    val events = ev((1, 1, 10, "a"), (2, 1, 20, "b"))
    val plan = EventOps.freshness(events)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange hashpartitioning\\(event_type".r.findAllIn(plan).length == 1, plan)
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }

  test("sessionCooccurrence: the set agg rides the session exchange, no self-join") {
    val events = ev((1, 1, 100, "a"), (2, 1, 200, "b"))
    val plan = EventOps.sessionCooccurrence(events)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // one corpus-sized exchange on user_id (window + session agg), one
    // pair-sized on (type_a, type_b)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length == 1, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
  }

  test("winsorizedStats: ranked-row bounds, comparison-only clipping, clip counts") {
    // user 1: 10 values 1..10 at pct=10 -> k_lo = 1, k_hi = 10: bounds are
    // the extremes, nothing clips. At pct=20 -> k_lo = 2, k_hi = 9: one
    // row clips at each end and the sums move by exactly the clip deltas.
    val events = evv((1 to 10).map(i => (i.toLong, 1L, i.toLong, i.toDouble)): _*)
    val relaxed = EventOps.winsorizedStats(events, pct = 10)
      .as[(Long, Long, Double, Double, Double, Double, Long, Long)].collect().head
    assert(relaxed == ((1L, 10L, 1.0, 10.0, 55.0, 55.0, 0L, 0L)), relaxed.toString)
    val tight = EventOps.winsorizedStats(events, pct = 20)
      .as[(Long, Long, Double, Double, Double, Double, Long, Long)].collect().head
    assert(tight == ((1L, 10L, 2.0, 9.0, 55.0, 55.0, 1L, 1L)),
      s"1->2 and 10->9: sum unchanged (+1-1), one clip each end: $tight")
    // a single-event user degenerates to lo = hi = its value, zero clips
    val lone = EventOps.winsorizedStats(evv((1, 7, 100, 3.25)), pct = 10)
      .as[(Long, Long, Double, Double, Double, Double, Long, Long)].collect().head
    assert(lone == ((7L, 1L, 3.25, 3.25, 3.25, 3.25, 0L, 0L)), lone.toString)
  }

  test("winsorizedStats matches a brute-force reference on a randomized log") {
    val rnd = new scala.util.Random(106)
    val rows = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(6) + 1).toLong, rnd.nextInt(1000).toLong,
        math.floor(rnd.nextDouble() * 10000) / 100))
    val got = EventOps.winsorizedStats(evv(rows: _*), pct = 10)
      .as[(Long, Long, Double, Double, Double, Double, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val expected = rows.groupBy(_._2).map { case (u, es) =>
      val sorted = es.sortBy(e => (e._4, e._1)).map(_._4)
      val n = sorted.size
      val kLo = (10 * n + 99) / 100
      val (lo, hi) = (sorted(kLo - 1), sorted(n - kLo))
      def cents(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      val raw = es.map(e => cents(e._4)).sum
      val win = es.map(e => cents(math.min(math.max(e._4, lo), hi))).sum
      u -> ((u, n.toLong, lo, hi, raw.toDouble, win.toDouble,
        es.count(_._4 < lo).toLong, es.count(_._4 > hi).toLong))
    }
    assert(got == expected, "winsorize must equal the literal ranked-row definition")
  }

  test("winsorizedStats is ONE exchange: windows, bound picks, and agg all share user_id") {
    val plan = EventOps.winsorizedStats(evv((1, 1, 10, 1.0), (2, 1, 20, 2.0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length == 1, plan)
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }

  /** A log with a planted bot: user 999 replays the same few actions
    * thousands of times (duplicate (type, ts) spam plus per-second
    * hammering), dwarfing the organic users — the 10^5x-median shape the
    * skew-safe variants exist for, shrunk to fixture scale. */
  private def botLog(): DataFrame = {
    val rnd = new scala.util.Random(911)
    val organic = (1 to 400).map { i =>
      (i.toLong, (i % 7 + 1).toLong, rnd.nextInt(2 * Day.toInt).toLong,
        Seq("view", "click", "purchase", "other")(rnd.nextInt(4)),
        math.floor(rnd.nextDouble() * 500) / 100)
    }
    val bot = (1 to 6000).map { i =>
      // 10 distinct seconds x 3 types, replayed 200x each: collapses 600x
      (10000L + i, 999L, (100 + (i % 10) * 5).toLong,
        Seq("view", "click", "purchase")(i % 3),
        math.floor(rnd.nextDouble() * 500) / 100)
    }
    (organic ++ bot).map { case (id, u, t, ty, v) => (id, u, ts(t), ty, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  test("skew-safe variants equal their originals on the planted-bot log") {
    val e = botLog()
    // q103: collapse is invisible to the funnel, deadline or not
    val plain = EventOps.funnel(e).collect().toSeq
    val collapsed = EventOps.funnel(EventOps.collapseFunnelEvents(e)).collect().toSeq
    assert(collapsed == plain, "collapse changed the funnel census")
    val gPlain = EventOps.funnel(e, maxGapSeconds = Some(30L)).collect().toSeq
    val gColl = EventOps.funnel(EventOps.collapseFunnelEvents(e),
      maxGapSeconds = Some(30L)).collect().toSeq
    assert(gColl == gPlain, "collapse changed the windowed funnel census")
    // q104: the windowless decay is bit-identical (exact-int algebra)
    val d0 = EventOps.decayScore(e).collect().toSet
    val d1 = EventOps.decayScoreSkewSafe(e).collect().toSet
    assert(d1 == d0, "windowless decay diverged from the window form")
    // q105: the per-second collapse is invisible to the burst census
    val b0 = EventOps.burstScore(e, windowSeconds = 20L, threshold = 5L)
      .collect().toSet
    val b1 = EventOps.burstScoreSkewSafe(e, windowSeconds = 20L, threshold = 5L)
      .collect().toSet
    assert(b1 == b0, "per-second collapse diverged from the event-level window")
  }

  test("decayScoreSkewSafe: no window, broadcast anchor join, combinable aggs only") {
    val plan = EventOps.decayScoreSkewSafe(evv((1, 1, 10, 1.0), (2, 1, 20, 2.0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // both shuffles move PARTIAL aggregates (skew collapses map-side);
    // the raw event table never hash-partitions by user_id
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("decayScoreSkewSafe: broadcastAnchors=false drops the hint, same rows") {
    // the high-user-cardinality escape hatch: past the broadcast
    // threshold the forced hint risks driver OOM, so the un-hinted form
    // must exist AND agree bit-for-bit (exact-int algebra either way)
    val e = botLog()
    val hinted = EventOps.decayScoreSkewSafe(e).collect().toSet
    val unhinted = EventOps.decayScoreSkewSafe(e, broadcastAnchors = false)
    assert(unhinted.collect().toSet == hinted,
      "un-hinted anchor join diverged from the broadcast form")
    // the pin is that the HINT is gone (the planner is free to choose —
    // AQE may still pick broadcast on a tiny fixture, and should)
    assert(!unhinted.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(EventOps.decayScoreSkewSafe(e).queryExecution.analyzed.toString
      .contains("ResolvedHint"))
  }

  test("burstScoreSkewSafe: the window's input is the per-second aggregate") {
    val plan = EventOps.burstScoreSkewSafe(ev((1, 1, 10, "a"), (2, 1, 20, "a")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // exchange 1: (user_id, sec) — spreads a hot user across partitions;
    // exchange 2: user_id for the window + final agg (shared). The raw
    // log only ever crosses the wire pre-collapsed.
    assert("Exchange hashpartitioning\\(user_id#\\d+L, sec".r.findAllIn(plan).length == 1, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
  }

  test("collapseFunnelEvents feeds the funnel window an aggregate, not the raw log") {
    val plan = EventOps.funnel(EventOps.collapseFunnelEvents(
      ev((1, 1, 10, "view"), (2, 1, 20, "click"), (3, 1, 30, "purchase"))))
      .queryExecution.executedPlan.toString
    // the collapse's exchange keys on (user_id, event_type, ts) — the
    // spam-spreading key; the window exchange then moves collapsed rows
    assert("Exchange hashpartitioning\\(user_id#\\d+L, event_type".r
      .findAllIn(plan).length == 1, plan)
  }
}
