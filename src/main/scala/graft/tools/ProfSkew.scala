package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.queries.EventOps

/** Measures the planted-bot skew curve behind SCALING.md's skew note:
  * the sf0.1 event log (100k events, 1,500 users, median 66 events/user)
  * plus ONE bot user at growing event counts (10^3x / 10^4x / 10^5x the
  * median), timing each user-keyed query in its window form versus its
  * skew-safe form (q103/q104/q105). Also times the worst window form
  * with AQE's skew handling force-enabled, to put a number on "AQE
  * cannot split a window or an aggregation — its skew rewrites apply to
  * joins only" rather than asserting it.
  *
  * The bot's traffic is shaped like real spam: it replays a small action
  * set (view/click/purchase) across one day, hammering each second many
  * times over — the duplicate mass the pre-collapse levers absorb
  * map-side.
  *
  * The window-form burst query is NOT timed past the 10^3x point: Spark
  * computes non-invertible aggregates over sliding frames by
  * re-aggregating the frame at each frame move (count has no retract),
  * so the bot's day costs O(distinct frame positions x frame size) —
  * with every bot event inside one trailing day, that is ~86,400 moves x
  * n-event frames, observed ~10 minutes PER RUN at 10^4x (660k bot
  * events) and extrapolating to hours at 10^5x. The skew-safe form caps
  * the frame at 86,400 per-second rows by construction, which is exactly
  * the point. Evidence tool, not part of the library surface.
  *
  * Usage: sbt 'runMain graft.tools.ProfSkew' (~10 min)
  */
object ProfSkew {
  private val Median = 66L

  /** sf0.1 events unioned with a one-day bot burst of `botEvents` rows
    * (user_id 10^9), written to parquet so every timed query pays the
    * same scan it would in production. */
  private def skewedTable(spark: SparkSession, botEvents: Long): DataFrame = {
    val path = s"/tmp/profskew/events_$botEvents"
    if (!new java.io.File(path).isDirectory) {
      val base = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      val types = array(lit("view"), lit("click"), lit("purchase"))
      val bot = spark.range(botEvents).select(
        (col("id") + 1000000L).as("event_id"),
        // one day of traffic, each second hit botEvents/86400 times over
        timestamp_seconds(lit(1700000000L) + col("id") % 86400L).as("ts"),
        lit(1000000000L).as("user_id"),
        element_at(types, (col("id") % 3 + 1).cast("int")).as("event_type"),
        (col("id") % 97).cast("double").as("value"),
        lit(null).cast("string").as("props"))
      base.unionByName(bot).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  private def time(q: DataFrame): Double = {
    val t0 = System.nanoTime()
    q.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** The sliding-RANGE-frame burst form burstScore SHIPPED BEFORE the
    * difference-of-running-sums rewrite — kept here (only) as the
    * measured baseline: Spark re-aggregates a sliding frame at every
    * frame move (count has no retract), O(frame x moves) per user. */
  private def burstSliding(events: DataFrame, windowSeconds: Long,
      threshold: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-(windowSeconds - 1),
        org.apache.spark.sql.expressions.Window.currentRow)
    events
      .select(col("user_id"), col("ts").cast("long").as("sec"))
      .withColumn("in_window", count(lit(1)).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("in_window")).as("max_burst"))
      .select(col("user_id"), col("n_events"), col("max_burst"),
        (col("max_burst") >= threshold).as("bursty"))
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("prof-skew")
    def report(label: String, mult: Long, secs: Double): Unit =
      println(f"[profskew] bot=${mult}x$Median%-7d $label%-22s wall=$secs%7.2fs")
    // mult=0 doubles as the codegen warmup for every plan shape: the
    // later scales re-use the same generated code, so their single
    // timed runs are not billed for compilation.
    for (mult <- Seq(0L, 0L, 1000L, 10000L, 100000L)) {
      val e = skewedTable(spark, mult * Median)
      report("funnel-window", mult, time(EventOps.funnel(e)))
      report("funnel-collapsed", mult, time(
        EventOps.funnel(EventOps.collapseFunnelEvents(e))))
      report("decay-window", mult, time(EventOps.decayScore(e)))
      report("decay-skewsafe", mult, time(EventOps.decayScoreSkewSafe(e)))
      if (mult <= 1000L)
        report("burst-SLIDING(old)", mult, time(
          burstSliding(e, windowSeconds = 86400L, threshold = 3L)))
      else
        println(s"[profskew] bot=${mult}x$Median burst-SLIDING(old) SKIPPED " +
          "(frame re-aggregation: ~10 min/run at 10^4x, hours at 10^5x)")
      report("burst-cumsum", mult, time(
        EventOps.burstScore(e, windowSeconds = 86400L, threshold = 3L)))
      report("burst-skewsafe", mult, time(
        EventOps.burstScoreSkewSafe(e, windowSeconds = 86400L, threshold = 3L)))
      // The as-of forward-match frame asymmetry, isolated: a running
      // first over [currentRow, unboundedFollowing] (AsOfJoin.fwdExpr
      // BEFORE the rewrite) versus the sequence-reversed running last
      // over [unboundedPreceding, currentRow] (after). Nulls interleaved
      // like the as-of payload struct. Same rows, same answer sites,
      // opposite frame direction — the entire difference is Spark's
      // re-aggregation of following frames.
      locally {
        import org.apache.spark.sql.expressions.Window
        val probe = e.select(col("user_id"), col("ts").cast("long").as("sec"),
          col("event_id"),
          when(col("event_id") % 2 === 0, col("value")).as("p"))
        if (mult <= 1000L)
          report("asof-follow-frame(old)", mult, time(probe.withColumn("m",
            first(col("p"), ignoreNulls = true).over(Window
              .partitionBy(col("user_id"))
              .orderBy(col("sec").asc, col("event_id").asc)
              .rowsBetween(Window.currentRow, Window.unboundedFollowing)))))
        else
          println(s"[profskew] bot=${mult}x$Median asof-follow-frame(old) " +
            "SKIPPED (following-frame re-aggregation, O(rows^2) per key)")
        report("asof-preceding(new)", mult, time(probe.withColumn("m",
          last(col("p"), ignoreNulls = true).over(Window
            .partitionBy(col("user_id"))
            .orderBy(col("sec").desc, col("event_id").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))))
      }
      // AQE skew handling force-enabled on the worst measurable window
      // point: the expected result is NO improvement (skew rewrites
      // apply to joins only)
      if (mult == 1000L) {
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        report("burst-SLIDING+aqeskew", mult, time(
          burstSliding(e, windowSeconds = 86400L, threshold = 3L)))
        report("funnel-window+aqeskew", mult, time(EventOps.funnel(e)))
        spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
      }
    }
    spark.stop()
  }
}
