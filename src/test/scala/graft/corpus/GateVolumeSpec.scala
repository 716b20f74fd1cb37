package graft.corpus

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.DedupOps

/** Full-DAG volume rehearsal of the STREAMING ingest gate — the r18
  * verdict's headline directive, completing the volume-rehearsal series
  * (r17 `PipelineVolumeSpec` found the cache-staleness bug, r18
  * `CorpusVolumeSpec` the deleteWhere provenance NPE): the one DAG
  * without a bench-scale rehearsal, composed of every warehouse
  * primitive those two bugs lived in. `CorpusStreamMain.start` +
  * `GateState` end-to-end at the bench scale (the sf0.1 documents table,
  * 5k docs, as the static corpus with its at-rest bucketed gate tables),
  * observing the WAREHOUSE PROTOCOL, manifest lifecycle, and reader
  * coherence around the stream rather than the per-operator semantics
  * (CorpusStreamMainSpec pins those small-scale):
  *
  *   1. several real micro-batches at volume: fresh uniques accepted,
  *      exact re-crawls of corpus docs dropped at the at-rest index,
  *      re-crawls of EARLIER-batch accepts dropped at the absorbed side,
  *      intra-batch bursts collapsed to one survivor;
  *   2. `compactState` WITH the at-rest tables cached in-session — the
  *      append must be visible through the cached readers, and the rerun
  *      must stay a no-op (no stale-cache double-append) while the
  *      caches live;
  *   3. restart from the compaction manifest re-folds nothing, yet the
  *      gate still drops near-dups of compacted accepts; a second
  *      compaction under a CACHED manifest reader republishes the
  *      manifest coherently (`compactedBatchIds` must see the new id);
  *   4. volume erasure (`purgeDocs`) with the tables AND the stream
  *      output root cached: rows leave every store, cached readers stay
  *      coherent, a re-purge reports all zeros;
  *   5. the composition hazard this rehearsal exists to probe: a
  *      published-but-UNCOMPACTED batch whose docs are ALL purged leaves
  *      an empty `batch=<id>` dir — restart (`resume`) and
  *      `compactState` must treat it as a valid no-row batch (it was
  *      real published history), not die inferring a schema from zero
  *      files; after compaction the manifest still records it, and an
  *      exact resubmission of a purged text is ACCEPTED (the gate
  *      forgot, which is the erasure contract);
  *   6. zero swap debris under the output tree after every stage.
  *
  * The scale argument rehearsed for 100 TB: per-batch cost rides the
  * (b, v)-bucketed at-rest index (no corpus-sized fold per batch),
  * restart cost is O(un-compacted tail) via the manifest, erasure is
  * O(hit files), and coherence is cache invalidation only — nothing
  * here lists or rewrites the unaffected estate. */
class GateVolumeSpec extends SparkSpec {
  import spark.implicits._

  private val baseDocs = "/root/testdata/sf0.1/documents.parquet"

  /** Swap-protocol debris (visible or hidden `.old`/`.staging`/`.del-`)
    * under `dir`, recursive — CorpusVolumeSpec's rule. */
  private def debris(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).toSeq.flatten.flatMap(x => x +: walk(x))
    walk(new java.io.File(dir)).map(_.getName)
      .filter(n => n.endsWith(".old") || n.endsWith(".staging") ||
        n.startsWith(".del-"))
  }

  private def uniques(idBase: Long, n: Int, tag: String) =
    (0 until n).map { i =>
      val text = s"gate volume $tag document $i " +
        (0 until 40).map(w => s"${tag}tok${i}x$w").mkString(" ")
      (idBase + i, text, "en", s"src_$tag", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("streaming gate full-DAG rehearsal at 5k docs: volume batches, cached-reader compaction, manifest restart, cached-reader erasure, emptied-batch restart, zero debris") {
    val root = Files.createTempDirectory("gate_volume").toString
    val (inDir, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    new java.io.File(inDir).mkdirs()
    val corpus = spark.read.parquet(baseDocs)
    val schema = corpus.schema

    // the corpus's at-rest gate tables, as CorpusMain --publish-index /
    // --publish-shingles write them — what an always-on gate runs over
    val corpusSh = DedupOps.shingledOf(corpus)
    DedupOps.writeCorpusBandIndex(corpusSh, "gv_idx", numBuckets = 8)
    DedupOps.writeCorpusShingles(corpusSh, "gv_sh", numBuckets = 8)
    try {
      def drop(name: String, df: org.apache.spark.sql.DataFrame): Unit =
        df.coalesce(1).write.mode("overwrite").parquet(s"$inDir/$name")
      def drain(): Unit = {
        val state = GateState.resume(spark, corpus, out,
          baseIndex = Some(spark.table("gv_idx")),
          baseShingles = Some(spark.table("gv_sh")))
        val q = CorpusStreamMain.start(
          spark.readStream.schema(schema).option("recursiveFileLookup", "true")
            .parquet(inDir), state, out, ckpt)
        try { q.processAllAvailable() } finally q.stop()
      }
      def publishedIds(batch: Long): Set[Long] =
        spark.read.parquet(s"$out/batch=$batch")
          .select("doc_id").as[Long].collect().toSet

      // ---- stage 1: batch 0 at volume — 500 uniques + 300 exact
      // re-crawls of (shingleable) corpus docs under new ids + 100
      // intra-batch duplicate pairs. Gate: re-crawls drop at the at-rest
      // index, bursts collapse to the min-id survivor, uniques pass.
      val longCorpus = corpus.filter(size(split(col("text"), " ")) >= 20)
        .orderBy("doc_id").limit(300)
      val recrawls0 = longCorpus.withColumn("doc_id", col("doc_id") + lit(20000000L))
      val burst = (0 until 100).flatMap { k =>
        val text = s"gate volume burst pair $k " +
          (0 until 40).map(w => s"burst${k}x$w").mkString(" ")
        Seq((30000000L + 2 * k, text, "en", "src_burst", text.length.toLong),
          (30000000L + 2 * k + 1, text, "en", "src_burst", text.length.toLong))
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val batch0Uniques = uniques(10000000L, 500, "b0")
      drop("crawl0", batch0Uniques.unionByName(recrawls0).unionByName(burst))
      drain()
      val ids0 = publishedIds(0L)
      assert(ids0.size == 600, s"500 uniques + 100 burst survivors, got ${ids0.size}")
      assert(!ids0.exists(id => id >= 20000000L && id < 30000000L),
        "every exact corpus re-crawl must drop at the at-rest index")
      val burstSurvivors = ids0.filter(id => id >= 30000000L && id < 40000000L)
      assert(burstSurvivors.size == 100 && burstSurvivors.forall(_ % 2 == 0),
        "each burst pair collapses to its min-id survivor")
      assert(debris(out).isEmpty, s"debris after batch 0: ${debris(out)}")

      // ---- stage 2: batch 1 — 200 exact re-crawls of batch-0 accepts
      // (the ABSORBED side must catch them: the at-rest tables know
      // nothing of these docs) + 300 fresh uniques
      val recrawls1 = batch0Uniques.orderBy("doc_id").limit(200)
        .withColumn("doc_id", col("doc_id") + lit(35000000L))
      drop("crawl1", uniques(50000000L, 300, "b1").unionByName(recrawls1))
      drain()
      val ids1 = publishedIds(1L)
      assert(ids1.size == 300 && ids1.forall(id => id >= 50000000L && id < 60000000L),
        s"absorbed-side gate must drop all 200 re-crawls of batch-0 accepts: ${ids1.size}")

      // ---- stage 3: compaction WITH the at-rest tables cached
      // in-session — the r17/r18 bug surface (cached readers over tables
      // a maintenance job rewrites under the session's feet)
      val cachedIdx = spark.table("gv_idx").cache()
      val cachedSh = spark.table("gv_sh").cache()
      val (idxBefore, shBefore) = (cachedIdx.count(), cachedSh.count())
      assert(GateState.compactState(spark, out, "gv_idx", "gv_sh",
        numBuckets = 8) == 2)
      val idxAfter = spark.table("gv_idx").count()
      val shAfter = spark.table("gv_sh").count()
      assert(idxAfter > idxBefore && shAfter > shBefore,
        "compaction must append the two batches' gate rows")
      assert(cachedIdx.count() == idxAfter && cachedSh.count() == shAfter,
        "cached readers over the tables must see the compaction appends")
      // rerun while the caches live: the per-table freshIds guard must
      // read CURRENT table contents, not a stale cache — a stale read
      // would re-append the tail as duplicates
      assert(GateState.compactState(spark, out, "gv_idx", "gv_sh",
        numBuckets = 8) == 0)
      assert(spark.table("gv_idx").count() == idxAfter &&
        spark.table("gv_sh").count() == shAfter,
        "a rerun under cached tables must append nothing")
      assert(debris(out).isEmpty, s"debris after compaction: ${debris(out)}")

      // ---- stage 4: restart from the manifest — nothing re-folds, yet
      // the gate still drops a re-crawl of a COMPACTED accept; batch 2
      // then runs through a real drain
      val restarted = GateState.resume(spark, corpus, out,
        baseIndex = Some(spark.table("gv_idx")),
        baseShingles = Some(spark.table("gv_sh")))
      val stats = restarted.absorbedStats()
      assert(stats.shingleRows == 0 && stats.indexRows == 0,
        s"manifest restart must re-fold nothing: $stats")
      assert(stats.batches == 2, s"published batch ids stay known: $stats")
      val recrawls2 = uniques(50000000L, 300, "b1").orderBy("doc_id").limit(150)
        .withColumn("doc_id", col("doc_id") + lit(10000000L))
      drop("crawl2", uniques(70000000L, 250, "b2").unionByName(recrawls2))
      drain()
      val ids2 = publishedIds(2L)
      assert(ids2.size == 250 && ids2.forall(id => id >= 70000000L && id < 80000000L),
        s"compacted-state gate must drop all 150 re-crawls of batch-1 accepts: ${ids2.size}")

      // ---- stage 5: second compaction under a CACHED manifest reader —
      // the manifest republish (directory swap) must stay coherent for
      // the cached reader AND for compactedBatchIds' fresh read (which
      // cache substitution serves from the refreshed entry)
      val cachedManifest = spark.read.parquet(s"$out/_gate_compacted").cache()
      assert(cachedManifest.count() == 2) // materialize pre-republish
      assert(GateState.compactState(spark, out, "gv_idx", "gv_sh",
        numBuckets = 8) == 1)
      try {
        assert(GateState.compactedBatchIds(spark, out) == Set(0L, 1L, 2L),
          "compactedBatchIds must see the republished manifest")
        assert(cachedManifest.select("batch").as[Long].collect().toSet ==
          Set(0L, 1L, 2L),
          "a cached manifest reader must see the republished manifest")
      } finally cachedManifest.unpersist()

      // ---- stage 6: volume erasure with the tables AND the output root
      // cached — purgeDocs over 50 compacted accepts; every store
      // scrubbed, cached readers coherent, re-purge all zeros
      val purgeIds = (ids0.toSeq.sorted.take(40) ++ ids2.toSeq.sorted.take(10))
      val cachedOut = spark.read.parquet(out).cache()
      val outRows = cachedOut.count()
      val report = GateState.purgeDocs(spark, purgeIds,
        indexTable = Some("gv_idx"), shinglesTable = Some("gv_sh"),
        output = Some(out))
      assert(report.values.map(_._2).sum > 0, s"purge must delete rows: $report")
      val purgedBox = purgeIds.map(Long.box)
      assert(spark.table("gv_idx").filter(col("corpus_id").isin(purgedBox: _*))
        .count() == 0, "index table must forget the purged docs")
      assert(spark.table("gv_sh").filter(col("doc_id").isin(purgedBox: _*))
        .count() == 0, "shingles table must forget the purged docs")
      assert(spark.read.parquet(out).filter(col("doc_id").isin(purgedBox: _*))
        .count() == 0, "no published batch dir may retain a purged doc")
      try {
        assert(cachedOut.count() == outRows - purgeIds.size,
          "a cached reader over the stream output must not serve erased rows")
        assert(cachedIdx.filter(col("corpus_id").isin(purgedBox: _*)).count() == 0,
          "a cached reader over the index table must not serve erased rows")
      } finally { cachedOut.unpersist(); cachedIdx.unpersist(); cachedSh.unpersist() }
      val again = GateState.purgeDocs(spark, purgeIds,
        indexTable = Some("gv_idx"), shinglesTable = Some("gv_sh"),
        output = Some(out))
      assert(again.values.forall(_ == ((0, 0L))), s"re-purge must no-op: $again")
      assert(debris(out).isEmpty, s"debris after erasure: ${debris(out)}")

      // ---- stage 7: the emptied-batch composition — publish a small
      // batch, purge ALL its docs (erasure requests arrive whenever they
      // like, including before the next compaction), then RESTART and
      // COMPACT: both read the published tail, and an all-purged batch
      // dir holds zero data files
      drop("crawl3", uniques(80000000L, 5, "b3"))
      drain()
      val ids3 = publishedIds(3L)
      assert(ids3.size == 5)
      GateState.purgeDocs(spark, ids3.toSeq,
        indexTable = Some("gv_idx"), shinglesTable = Some("gv_sh"),
        output = Some(out))
      // restart with an emptied un-compacted batch: a valid no-row batch
      // (it was real published history), not a schema-inference crash
      val afterPurge = GateState.resume(spark, corpus, out,
        baseIndex = Some(spark.table("gv_idx")),
        baseShingles = Some(spark.table("gv_sh")))
      val statsAfter = afterPurge.absorbedStats()
      assert(statsAfter.batches == 4,
        s"batch 3 is published history even emptied: $statsAfter")
      assert(statsAfter.shingleRows == 0 && statsAfter.indexRows == 0,
        s"an emptied batch has nothing to re-fold: $statsAfter")
      // compaction must also survive the emptied tail — and mark the
      // batch compacted so restarts stop reconsidering it
      val idxPre = spark.table("gv_idx").count()
      assert(GateState.compactState(spark, out, "gv_idx", "gv_sh",
        numBuckets = 8) == 1, "the emptied batch folds (as zero rows)")
      assert(spark.table("gv_idx").count() == idxPre,
        "an emptied batch appends no index rows")
      assert(GateState.compactedBatchIds(spark, out) == Set(0L, 1L, 2L, 3L),
        "the manifest must record the emptied batch")
      // the erasure contract, end to end: an exact resubmission of a
      // purged text under a new id is ACCEPTED — the gate forgot
      val resubmitText = uniques(80000000L, 5, "b3")
        .orderBy("doc_id").limit(1).select("text").as[String].head()
      drop("crawl4", Seq((90000000L, resubmitText, "en", "src_resub",
        resubmitText.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      drain()
      assert(publishedIds(4L) == Set(90000000L),
        "a resubmission of a purged text must be accepted")
      assert(debris(out).isEmpty, s"debris at the end: ${debris(out)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS gv_idx")
      spark.sql("DROP TABLE IF EXISTS gv_sh")
    }
  }
}
