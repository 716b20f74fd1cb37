package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Warehouse

/** Full-DAG volume rehearsal of the CONTINUOUS incremental-MV folds — the
  * r19 verdict's headline directive, extending the volume-rehearsal series
  * (r17 `PipelineVolumeSpec` found the cache-staleness bug, r18
  * `CorpusVolumeSpec` the deleteWhere provenance NPE, r19 `GateVolumeSpec`
  * the purge root-cache and emptied-batch bugs) to the one estate composing
  * both recurring bug families without a bench-scale rehearsal: the five
  * `maintain*Batch` folds (`IncrementalAgg`) — agg, distinct-support,
  * extrema, top-k, enforced-extrema — run as ONE CDC feed fanning into five
  * at-rest views (the module's one-feed-many-views pairing), at the bench
  * scale (the sf0.1 orders table, 150k rows), observing the WAREHOUSE
  * PROTOCOL, marker lifecycle, and reader coherence around the stream
  * rather than per-fold semantics (IncrementalAggSpec pins those
  * small-scale):
  *
  *   1. a volume bootstrap batch (~60k CDC inserts over ~1k keys): every
  *      view equals its direct-recompute oracle over the landed base;
  *   2. a mixed batch (inserts + deletes of extremal rows + updates) WITH
  *      all five MV dirs cached in-session mid-stream — the folds must
  *      read the CURRENT views through cache substitution (a stale cache
  *      double-folds), and the cached readers must see each publish;
  *   3. a `deleteWhere` erasure against the BASE while the folds are live,
  *      base cached: the extrema/top-k at-risk recomputes must read the
  *      POST-erasure base through the refreshed cache (a stale base
  *      resurrects erased extrema), and the erased key range leaves every
  *      view — a fold that empties a key range;
  *   4. replay: a redelivered micro-batch id is a no-op on every view at
  *      volume (poisoned payload, unchanged MVs);
  *   5. the composition hazard this rehearsal exists to probe: a COMPLETE
  *      erasure across the view estates (`deleteWhere` empties every MV
  *      dir and the base of data files — markers and _SUCCESS survive):
  *      re-erasure reports zeros, and the NEXT trigger must treat each
  *      emptied dir as a valid empty view (real published history emptied
  *      — GateState's rule), not die inferring a schema from zero files,
  *      while the surviving marker still gates replay;
  *   6. a delete-only batch folding against an erasure-EMPTIED base (zero
  *      data files): the base-reading folds must treat it as the empty
  *      post-delta state, not a schema-inference crash; every key departs
  *      and every view publishes readable empty;
  *   7. an empty micro-batch under a fresh id publishes readable and
  *      changes nothing; zero swap debris under every estate throughout.
  *
  * The scale argument rehearsed for 100 TB: per trigger each fold is
  * O(|batch| + |MV|) with the at-risk base access delta-bounded (broadcast
  * probes — IncrementalAggSpec's plan pins); erasure is O(hit files);
  * restart cost is one marker read per view; coherence is cache
  * invalidation only — nothing here rescans or rewrites the unaffected
  * estate. */
class IncrementalVolumeSpec extends SparkSpec {
  import spark.implicits._

  private val ordersPath = "/root/testdata/sf0.1/orders.parquet"

  /** Swap-protocol debris (visible or hidden `.old`/`.staging`/`.del-`)
    * under `dir`, recursive — the series' shared rule. */
  private def debris(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).toSeq.flatten.flatMap(x => x +: walk(x))
    walk(new java.io.File(dir)).map(_.getName)
      .filter(n => n.endsWith(".old") || n.endsWith(".staging") ||
        n.startsWith(".del-"))
  }

  private def visibleFiles(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).toSeq.flatten.flatMap(x => x +: walk(x))
    walk(new java.io.File(dir)).filter(_.isFile).map(_.getName)
      .filter(n => !n.startsWith(".") && !n.startsWith("_"))
  }

  // ---- CDC event constructors over the (k, id, v) fact shape ----------
  private val decNull = lit(null).cast("decimal(18,4)")
  private def ins(rows: DataFrame): DataFrame =
    rows.select(lit("insert").as("op"), col("k"), col("id"),
      decNull.as("old_value"), col("v").as("new_value"))
  private def del(rows: DataFrame): DataFrame =
    rows.select(lit("delete").as("op"), col("k"), col("id"),
      col("v").as("old_value"), decNull.as("new_value"))
  private def upd(rows: DataFrame): DataFrame =
    rows.select(lit("update").as("op"), col("k"), col("id"),
      col("v").as("old_value"),
      (col("v") + lit(1000)).cast("decimal(18,4)").as("new_value"))

  // ---- per-view oracles: direct recompute over the landed base --------
  private def collectAgg(df: DataFrame): Map[Long, (Long, java.math.BigDecimal)] =
    df.select(col("k"), col("n_rows"), col("sum_value").cast("decimal(38,4)"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDecimal(2).setScale(4)))).toMap
  private def aggOracle(base: DataFrame): DataFrame =
    base.groupBy("k").agg(count(lit(1)).as("n_rows"), sum("v").as("sum_value"))

  private def collectExt(df: DataFrame)
      : Map[Long, (Long, java.math.BigDecimal, java.math.BigDecimal, java.math.BigDecimal)] =
    df.select(col("k"), col("n_rows"), col("sum_value").cast("decimal(38,4)"),
        col("min_value").cast("decimal(18,4)"), col("max_value").cast("decimal(18,4)"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        r.getDecimal(2).setScale(4), r.getDecimal(3).setScale(4),
        r.getDecimal(4).setScale(4)))).toMap
  private def extOracle(base: DataFrame): DataFrame =
    base.groupBy("k").agg(count(lit(1)).as("n_rows"), sum("v").as("sum_value"),
      min("v").as("min_value"), max("v").as("max_value"))

  private def collectDist(df: DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  private def distOracle(base: DataFrame): DataFrame =
    base.groupBy("k").agg(countDistinct(col("v")).as("n_distinct"),
      count(lit(1)).as("n_rows"))

  private def collectTop(df: DataFrame): Map[Long, Set[(Long, Double)]] =
    df.select(col("k"), col("id"), col("v").cast("double"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  private def topOracle(base: DataFrame, kk: Int): DataFrame = {
    // row_number over graft_topk's total order (value desc, ties to the
    // LOWER id) — independent of the kernel under test
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
      .orderBy(col("v").cast("double").desc, col("id").asc)
    base.withColumn("rn", row_number().over(w)).filter(col("rn") <= kk)
      .select(col("k"), col("id"), col("v").cast("double").as("v"))
  }

  private def collectEnf(df: DataFrame): Map[Long, (Long, Double, Long, Double)] =
    df.select(col("k"), col("min_id"), col("min_value").cast("double"),
        col("max_id"), col("max_value").cast("double"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
  private def enfOracle(base: DataFrame): DataFrame =
    base.groupBy(col("k")).agg(
      min(struct(col("v").cast("double").as("v"), col("id"))).as("mn"),
      max(struct(col("v").cast("double").as("v"), (-col("id")).as("nid"))).as("mx"))
      .select(col("k"), col("mn.id").as("min_id"), col("mn.v").as("min_value"),
        (-col("mx.nid")).as("max_id"), col("mx.v").as("max_value"))

  test("incremental-MV full-DAG rehearsal at sf0.1: five folds on one CDC feed, cached-reader coherence, mid-stream base erasure, replay, emptied-estate restart, emptied-base fold, zero debris") {
    val root = java.nio.file.Files.createTempDirectory("mv_volume").toString
    val inDir = s"$root/in"; new java.io.File(inDir).mkdirs()
    val ckpt = s"$root/ckpt"
    val baseDir = s"$root/base"
    val aggDir = s"$root/agg"; val distDir = s"$root/dist"
    val extDir = s"$root/ext"; val topDir = s"$root/top"
    val enfDir = s"$root/enf"
    val mvDirs = Seq(aggDir, distDir, extDir, topDir, enfDir)

    // sf0.1 orders as the fact domain: ~1k keys x ~150 rows, ids unique
    // (the feed contract needs one event per physical row per batch)
    val orders = spark.read.parquet(ordersPath)
      .select((col("o_custkey") % 1000).as("k"), col("o_orderkey").as("id"),
        col("o_totalprice").cast("decimal(18,4)").as("v"),
        (col("o_orderkey") % 10).as("m"))
    val sliceA = orders.filter(col("m") < 4)           // ~60k bootstrap
    val sliceB = orders.filter(col("m").isin(4, 5))    // ~30k batch-1 inserts
    val delA = sliceA.filter(col("m") === 0)           // ~15k batch-1 deletes
    val updA = sliceA.filter(col("m") === 1)           // ~15k batch-1 updates

    def landBase(df: DataFrame): Unit =
      df.select("k", "id", "v").write.mode("overwrite").parquet(baseDir)
    def baseNow(): DataFrame = spark.read.parquet(baseDir)
    var nDrop = 0
    def drop(cdc: DataFrame): Unit = {
      nDrop += 1
      cdc.coalesce(1).write.parquet(s"$inDir/cdc$nDrop")
    }
    def foldAll(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        id: Long): Unit = {
      IncrementalAgg.maintainAggBatch(aggDir, Seq("k"))(batch, id)
      IncrementalAgg.maintainDistinctBatch(distDir, Seq("k"))(batch, id)
      IncrementalAgg.maintainExtremaBatch(extDir, baseDir, Seq("k"))(batch, id)
      IncrementalAgg.maintainTopKBatch(topDir, baseDir, Seq("k"), k = 5)(batch, id)
      IncrementalAgg.maintainExtremaEnforcedBatch(enfDir, baseDir, Seq("k"))(
        batch, id)
    }
    val cdcSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "op string, k bigint, id bigint, old_value decimal(18,4), " +
        "new_value decimal(18,4)")
    def drain(): Unit = {
      val q = spark.readStream.schema(cdcSchema)
        .option("recursiveFileLookup", "true").parquet(inDir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(foldAll _).start()
      try q.processAllAvailable() finally q.stop()
    }
    def assertAllViews(base: DataFrame, clue: String): Unit = {
      assert(collectAgg(spark.read.parquet(aggDir)) ==
        collectAgg(aggOracle(base)), s"$clue: agg view diverged")
      assert(collectDist(IncrementalAgg.distinctCounts(
        spark.read.parquet(distDir), Seq("k"))) ==
        collectDist(distOracle(base)), s"$clue: distinct view diverged")
      assert(collectExt(spark.read.parquet(extDir)) ==
        collectExt(extOracle(base)), s"$clue: extrema view diverged")
      assert(collectTop(spark.read.parquet(topDir)) ==
        collectTop(topOracle(base, 5)), s"$clue: top-k view diverged")
      assert(collectEnf(spark.read.parquet(enfDir)) ==
        collectEnf(enfOracle(base)), s"$clue: enforced view diverged")
    }
    def assertNoDebris(clue: String): Unit =
      (mvDirs :+ baseDir).foreach(d =>
        assert(debris(d).isEmpty, s"$clue: debris under $d: ${debris(d)}"))

    // ---- stage 1: volume bootstrap — one ~60k-insert batch over ~1k keys
    landBase(sliceA)
    drop(ins(sliceA))
    drain()
    assertAllViews(baseNow(), "bootstrap")
    assertNoDebris("bootstrap")

    // ---- stage 2: mixed batch WITH all five views cached in-session —
    // the folds must read the CURRENT views through cache substitution
    // (a stale cache double-folds), and the cached readers must see the
    // publish (the r17 publish-coherence rule, here under foreachBatch)
    val cachedViews = mvDirs.map(d => d -> spark.read.parquet(d).cache()).toMap
    cachedViews.values.foreach(_.count()) // materialize pre-publish
    val base1 = sliceA.filter(col("m") =!= 0)
      .withColumn("v", when(col("m") === 1,
        (col("v") + lit(1000)).cast("decimal(18,4)")).otherwise(col("v")))
      .unionByName(sliceB)
    landBase(base1)
    drop(ins(sliceB).unionByName(del(delA)).unionByName(upd(updA)))
    drain()
    assertAllViews(baseNow(), "mixed batch")
    // cached readers over every view must serve the refreshed contents
    assert(collectAgg(cachedViews(aggDir)) ==
      collectAgg(spark.read.parquet(aggDir)),
      "a cached agg-view reader must see the fold's publish")
    assert(collectExt(cachedViews(extDir)) ==
      collectExt(spark.read.parquet(extDir)),
      "a cached extrema-view reader must see the fold's publish")
    assert(cachedViews(distDir).count() == spark.read.parquet(distDir).count() &&
      cachedViews(topDir).count() == spark.read.parquet(topDir).count() &&
      cachedViews(enfDir).count() == spark.read.parquet(enfDir).count(),
      "cached support/top-k/enforced readers must see the fold's publish")
    assertNoDebris("mixed batch")

    // ---- stage 3: GDPR key-range erasure against the BASE while the
    // folds are live, base CACHED — the erasure arrives as deleteWhere on
    // the base (its writer) plus matching CDC deletes; the at-risk
    // recomputes must read the POST-erasure base through the refreshed
    // cache (a stale base resurrects erased minima), and keys 0-49 leave
    // every view (the fold empties a key range)
    val cachedBase = spark.read.parquet(baseDir).cache()
    val erasedRows = cachedBase.filter(col("k") < 50)
    val nErased = erasedRows.count() // materializes the cache too
    assert(nErased > 0)
    drop(del(erasedRows)) // staged BEFORE the erasure, from pre-state
    val (filesHit, rowsErased) =
      Warehouse.deleteWhere(spark, baseDir, col("k") < 50)
    assert(rowsErased == nErased, s"erasure must hit all $nErased rows")
    assert(filesHit > 0)
    assert(cachedBase.filter(col("k") < 50).count() == 0,
      "a cached base reader must not serve erased rows")
    drain()
    val postErasure = baseNow()
    assert(postErasure.filter(col("k") < 50).count() == 0)
    assertAllViews(postErasure, "post-erasure")
    Seq(aggDir, extDir, topDir, enfDir, distDir).foreach(d =>
      assert(spark.read.parquet(d).filter(col("k") < 50).count() == 0,
        s"erased key range must leave the view at $d"))
    cachedViews.values.foreach(_.unpersist()); cachedBase.unpersist()
    assertNoDebris("post-erasure")

    // ---- stage 4: replay — the stream has applied batch ids 0..2; a
    // redelivered id with a poisoned payload must be a no-op on EVERY view
    val before = (collectAgg(spark.read.parquet(aggDir)),
      collectExt(spark.read.parquet(extDir)),
      collectTop(spark.read.parquet(topDir)),
      collectEnf(spark.read.parquet(enfDir)),
      spark.read.parquet(distDir).count())
    val poison = ins(Seq((7L, 424242L, "999999.9999")).toDF("k", "id", "vs")
      .select(col("k"), col("id"), col("vs").cast("decimal(18,4)").as("v")))
    foldAll(poison, 2L)
    assert((collectAgg(spark.read.parquet(aggDir)),
      collectExt(spark.read.parquet(extDir)),
      collectTop(spark.read.parquet(topDir)),
      collectEnf(spark.read.parquet(enfDir)),
      spark.read.parquet(distDir).count()) == before,
      "a replayed micro-batch id must fold nothing into any view")

    // ---- stage 5: COMPLETE erasure across the view estates — deleteWhere
    // empties every MV dir and the base of data files (markers and
    // _SUCCESS survive); re-erasure reports zeros. This is the emptied-
    // estate state a tenant-offboarding erasure leaves behind between
    // triggers.
    (mvDirs :+ baseDir).foreach { d =>
      val (f, r) = Warehouse.deleteWhere(spark, d, col("k").isNotNull)
      assert(f > 0 && r > 0, s"total erasure must hit $d: ($f, $r)")
      assert(visibleFiles(d).isEmpty,
        s"total erasure must leave zero data files under $d: ${visibleFiles(d)}")
      assert(Warehouse.deleteWhere(spark, d, col("k").isNotNull) == ((0, 0L)),
        s"re-erasure must no-op at $d")
    }
    mvDirs.foreach(d => assert(
      new java.io.File(d, "_applied_batch").isFile,
      s"the applied-batch marker must survive erasure at $d"))
    assertNoDebris("emptied estate")

    // ---- stage 6: rebirth — the next trigger folds a fresh insert batch
    // against the emptied view dirs: each must be read as a valid EMPTY
    // view (real published history emptied), not a schema-inference
    // crash, while the surviving marker still gates replay
    val sliceC = orders.filter(col("m") === 6)
      .select(((col("k") % 400) + 2000).as("k"),
        (col("id") + 10000000L).as("id"), col("v"))
    landBase(sliceC)
    drop(ins(sliceC))
    drain() // batch 3 — dies on zero-file schema inference without the fix
    assertAllViews(baseNow(), "rebirth over emptied estates")
    // the marker survived the erasure: an old id still skips
    foldAll(poison, 1L)
    assertAllViews(baseNow(), "replay against the reborn views")

    // ---- stage 7: a delete-only batch folding against an erasure-EMPTIED
    // base — the erasure lands on the base (zero data files) and arrives
    // as CDC deletes of every remaining row; the base-reading folds must
    // treat the emptied dir as the empty post-delta state (not a
    // schema-inference crash), every key departs, and every view
    // publishes readable empty
    drop(del(baseNow())) // staged from pre-state, before the erasure
    val (bf, br) = Warehouse.deleteWhere(spark, baseDir, col("k").isNotNull)
    assert(bf > 0 && br > 0)
    assert(visibleFiles(baseDir).isEmpty)
    drain() // batch 4 — dies reading the zero-file base without the fix
    mvDirs.foreach { d =>
      val view = spark.read.parquet(d) // readable: schema survives empty
      assert(view.count() == 0, s"every key departed: $d must be empty")
    }

    // ---- stage 8: an EMPTY micro-batch under a fresh id publishes
    // readable and changes nothing (the write side of the empty-batch
    // rule, here for all five folds at once — base still emptied)
    foldAll(poison.limit(0), 99L)
    mvDirs.foreach { d =>
      assert(spark.read.parquet(d).count() == 0,
        s"an empty batch must publish a readable empty view at $d")
    }
    assertNoDebris("end")
  }
}
