package graft

import graft.tools.Jsons.{str => js}

object Bench {
  // Per-query accounting note: the dedup family each rebuild the staged
  // shingle table inside their timed window because run() clears all
  // caches between queries. That is deliberate — every query is billed
  // its own full cost, none rides another's cache — but it means the
  // suite total counts the ~same staging stage several times; cross-round
  // trends on those queries move together when staging cost moves. The
  // machine-readable "staged" list in the output JSON marks them.
  // Known jitter: q07 carries THREE broadcast builds in its timed window
  // (driver-side hash-relation construction is scheduler-sensitive);
  // adjudicated across rounds at 0.95-1.26s on unchanged code with
  // back-to-back runs 0.2s apart — treat <= ~1.3s as harness noise, not
  // a plan regression (the plan itself is PlanSpec-pinned).
  private val stagedQueries = Seq("q31_minhash_lsh", "q32_simhash",
    "q33_ngram_jaccard", "q38_components", "q39_dedupe_corpus",
    "q48_neardup_gate", "q51_decontaminate")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // fail loudly BEFORE the multi-minute warmup if the staged list drifts
    // from the registry (a renamed query would otherwise mislabel the
    // machine-readable "staged" array) — a pure lookup, instant
    stagedQueries.filterNot(SparkEntry.queries.contains) match {
      case Nil => ()
      case missing => sys.error(s"staged list names unknown queries: $missing")
    }
    val spark = Sessions.local("graft-bench")
    // Warm the JVM once per PLAN SHAPE, not just once per process: run every
    // query at the smallest scale factor (untimed) before any measurement.
    // Whole-stage codegen compilation + C2 JIT of a plan's generated code is
    // multi-second and paid on first touch — without this, that one-off cost
    // lands on whichever query first exercises a stack (profiled: the first
    // dedup query was billed 3.5s of codegen the rest of the suite then rode
    // for free). Warming at sf0.001 compiles the same generated classes the
    // timed run uses while touching ~1% of the data.
    // Warm dir derives from the timed dir (sibling sf0.001 under the same
    // parent, overridable via SPARK_GRAFT_WARM_DIR) — a hardcoded path made
    // every warmup silently fail on any box without /root/testdata, which
    // re-billed the first timed query for multi-second codegen. If no small
    // sibling exists, warm on the timed dir itself (slower warmup, still
    // correct) and say so once, loudly.
    val warmDir = sys.env.get("SPARK_GRAFT_WARM_DIR").getOrElse {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sibling.isDirectory) sibling.getPath
      else {
        System.err.println(
          s"[bench] WARN: no sf0.001 sibling of $sfDir; warming on the timed dir itself")
        sfDir
      }
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed (ignored): ${e.getMessage}")
      }
    }
    // Forensics for JIT health: warming 50+ codegen'd plans can exhaust the
    // JVM code cache (raised to 512m in build.sbt); if it still fills,
    // HotSpot silently stops compiling and every later query runs partly
    // interpreted. Surface the high-water mark so a regression is
    // attributable from bench stderr alone.
    def codeCacheReport(label: String): Unit = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .foreach { p =>
          val u = p.getUsage
          System.err.println(
            f"[bench] $label ${p.getName}: used=${u.getUsed / 1e6}%.0fMB max=${u.getMax / 1e6}%.0fMB")
        }
    }
    codeCacheReport("post-warmup")
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val flaky = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // One timed run: clear all cached blocks first so no query is billed
      // for (or subsidized by) another query's persisted stages, then
      // materialize through the noop sink — unlike count(), noop touches
      // every column of every row, so Catalyst can't prune the projection.
      def run(): Double = {
        spark.catalog.clearCache()
        // also drop RDD-level blocks (components()' localCheckpoints live
        // OUTSIDE the SQL cache): between queries nothing references them,
        // and leaving them to the ContextCleaner lets earlier queries'
        // blocks pressure later queries' memory. BLOCKING: the sweep runs
        // before t0, so an async removal cannot bleed into the timed window
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // Best-of-2: single-shot timings showed one-off multi-second stalls
      // (GC/scheduler noise) on queries that run in ~1s steady-state. A
      // second-run failure keeps the first, valid measurement — only a
      // query that never succeeded is reported failed; the name still
      // lands in the machine-readable "flaky" array so an intermittent
      // crash (e.g. a sporadic OOM) is visible to the driver, not only on
      // stderr.
      try {
        val a = run()
        val b =
          try Some(run())
          catch { case e: Throwable =>
            flaky += name
            System.err.println(
              s"[bench] $name second run failed (keeping first timing): ${e.getMessage}")
            None
          }
        name -> b.fold(a)(math.min(a, _))
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        name -> -1.0 // sentinel: failed queries carry no timing (NaN isn't JSON)
      }
    }
    // release the staged shingle cache the last query left behind (the
    // dedup family's staged table lives in the SQL cache; run() clears it
    // between queries, this frees the final query's entry)
    spark.catalog.clearCache()
    codeCacheReport("post-run")
    val qs = results.map { case (k, v) => js(k) + ":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map(js(_)).mkString("[", ",", "]")
    val flakyJson = flaky.map(js(_)).mkString("[", ",", "]")
    val stagedJson = stagedQueries.map(js(_)).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"flaky":$flakyJson,"staged":$stagedJson,"sf":${js(sfDir)}}""")
    spark.stop()
  }
}
