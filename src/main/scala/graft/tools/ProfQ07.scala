package graft.tools

import java.lang.management.ManagementFactory

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

import graft.{Sessions, SparkEntry}

/** The q07_broadcast_dims wobble harness (r14 verdict item 4): three
  * rounds of isolated q07 spikes (r13 driver 13.2 s observed vs a 1.3 s
  * band; a 1.60 s judge run at r14) that never reproduce within a round.
  * This main runs q07 N times back to back under Bench's protocol and,
  * per iteration, splits the wall time into the three
  * BroadcastExchangeExec phases Spark already meters — collect (driver
  * pulls the dim rows), build (HashedRelation construction), broadcast
  * (torrent distribution) — beside the JVM's GC time/count delta for
  * the iteration, so a spike's cause is NAMED by the phase that ate it:
  *
  *   - GC delta spikes with wall -> allocation/GC pause (the likely
  *     class: q07 lands early in the alphabetical run order, while the
  *     heap still churns from warmup);
  *   - collect/build/broadcast spikes -> the broadcast machinery itself
  *     (thread-pool cold start, torrent block contention);
  *   - NONE of them spike while wall does -> the time went to the fact
  *     scan/aggregate or the OS (box noise).
  *
  * Iteration 1 is flagged: it is the first execution after warmup —
  * exactly Bench's situation when the driver observed the spike — so
  * repeated INVOCATIONS of this main sample the fresh-JVM case, while
  * the in-JVM repeats bound the steady-state jitter. Findings land in
  * SCALING.md; the band itself moves only through EnvelopeRule. */
object ProfQ07 {

  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(walk)
  }

  /** Sum of a named metric over every broadcast exchange in the executed
    * (post-AQE) plan, in the metric's native unit (ms for the *Time
    * metrics). Reused exchanges dedupe by id so a relation built once is
    * counted once. */
  private def bcastMetric(plan: SparkPlan, name: String): Long =
    walk(plan).collect { case b: BroadcastExchangeExec => b }
      .distinctBy(_.id)
      .map(b => b.metrics.get(name).map(_.value).getOrElse(0L)).sum

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = Sessions.local("graft-prof-q07")
    val gcBeans = ManagementFactory.getGarbageCollectorMXBeans
    def gcNow(): (Long, Long) = {
      var t = 0L; var c = 0L
      gcBeans.forEach { b => t += b.getCollectionTime; c += b.getCollectionCount }
      (t, c)
    }
    // Bench's warmup discipline: one run at the sf0.001 sibling compiles
    // the codegen classes, then every timed run starts cache-clean
    val warmDir = {
      val sib = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sib.isDirectory) sib.getPath else sfDir
    }
    SparkEntry.queries("q07_broadcast_dims")(spark, warmDir)
      .write.format("noop").mode("overwrite").save()
    println("iter,wall_s,gc_ms,gc_n,bcast_collect_ms,bcast_build_ms,bcast_broadcast_ms,note")
    val rows = (1 to iters).map { i =>
      spark.catalog.clearCache()
      val (gt0, gc0) = gcNow()
      val t0 = System.nanoTime()
      // collect, not noop: the result is <= |region x nation| rows, and
      // keeping ONE QueryExecution lets the metric walk read the actual
      // executed exchanges of the timed run
      val df = SparkEntry.queries("q07_broadcast_dims")(spark, sfDir)
      val n = df.collect().length
      val wall = (System.nanoTime() - t0) / 1e9
      val (gt1, gc1) = gcNow()
      val plan = df.queryExecution.executedPlan
      val (cms, bms, xms) = (bcastMetric(plan, "collectTime"),
        bcastMetric(plan, "buildTime"), bcastMetric(plan, "broadcastTime"))
      val note = if (i == 1) "first-after-warmup (Bench's position)" else ""
      println(f"$i,$wall%.3f,${gt1 - gt0},${gc1 - gc0},$cms,$bms,$xms,$note")
      require(n > 0, "q07 returned no rows — wrong sf dir?")
      (wall, gt1 - gt0, cms + bms + xms)
    }
    val walls = rows.map(_._1).sorted
    // true midpoint: for even n average the two middle observations —
    // the upper-middle pick inflated the median and deflated the
    // max/median spike ratio the summary is built around (r15 advisory)
    val med =
      if (walls.length % 2 == 1) walls(walls.length / 2)
      else (walls(walls.length / 2 - 1) + walls(walls.length / 2)) / 2.0
    val worst = rows.maxBy(_._1)
    println(f"summary: n=$iters median=$med%.3f s min=${walls.head}%.3f " +
      f"max=${walls.last}%.3f (x${walls.last / med}%.2f of median; worst " +
      f"iter gc=${worst._2} ms, bcast=${worst._3} ms)")
    spark.stop()
  }
}
