package graft.corpus

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.DedupOps

/** Full-DAG volume rehearsal of the corpus pipeline — the r17 verdict's
  * optional stretch, mirroring what `PipelineVolumeSpec` does for the
  * NBA DAG: `CorpusMain.runWith` end-to-end at the bench scale (the
  * sf0.1 documents table, 5k docs, grown with synthetic uniques and
  * planted exact dups), observing the WAREHOUSE PROTOCOL and reader
  * coherence around the operators rather than the operators themselves
  * (CorpusMainSpec pins those per-stage at small scale):
  *
  *   1. the published corpus is exactly the survivor set of its own
  *      published pair audit at volume, split-partitioned;
  *   2. a GROWTH rerun (new docs appended to the input) republishes via
  *      per-partition swap — membership is exactly the grown survivor
  *      set, never an append of duplicates — and a Dataset the session
  *      CACHED over the pre-growth corpus serves the post-growth rows
  *      (the r17 publish-coherence rule observed through the real DAG);
  *   3. GDPR erasure at volume WITH THE TABLE CACHED: purgeCurated's
  *      deleteWhere must see real file provenance despite the cache
  *      (the r18 fix — under the old code this NPE'd on input_file_name
  *      = "" from the InMemoryRelation), erase exactly the named ids,
  *      and leave the cached reader coherent; a re-purge reports all
  *      zeros (idempotence);
  *   4. after every publish/erase cycle the output tree carries ZERO
  *      swap debris (no visible or hidden `.old` / `.staging` / `.del-`
  *      leftovers) — the crash-window protocol cleans up after itself.
  *
  * The scale argument rehearsed for 100 TB: growth and erasure both
  * touch O(affected files/partitions), the pair audit stays
  * banded/bucketed (no all-pairs), and cache coherence is invalidation
  * only — nothing here lists or rewrites the unaffected estate. */
class CorpusVolumeSpec extends SparkSpec {
  import spark.implicits._

  private val baseDocs = "/root/testdata/sf0.1/documents.parquet"

  /** Visible or hidden swap-protocol debris under `dir` (recursive):
    * `.old` / `.staging` / `.del-` entries a crash would leave and a
    * clean run must not. `_SUCCESS`/`.crc` markers are not debris. */
  private def debris(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).toSeq.flatten.flatMap(x => x +: walk(x))
    walk(new java.io.File(dir)).map(_.getName)
      .filter(n => n.endsWith(".old") || n.endsWith(".staging") ||
        n.startsWith(".del-"))
  }

  test("corpus full-DAG rehearsal at 5k docs: survivor-set publish, growth rerun under a cached reader, cached-table erasure, zero swap debris") {
    val root = Files.createTempDirectory("corpus_volume").toString
    val out = s"$root/out"
    val docs = spark.read.parquet(baseDocs)

    // ---- stage 1: initial publish over the bench-scale table
    val in1 = s"$root/in1"
    docs.write.parquet(s"$in1/documents.parquet")
    CorpusMain.runWith(spark, in1, out)
    val corpus1 = spark.read.parquet(s"$out/corpus")
    val ids1 = corpus1.select("doc_id").as[Long].collect().toSet
    val expected1 = DedupOps.dedupeCorpus(docs,
      spark.read.parquet(s"$out/near_dup_pairs"))
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == expected1,
      "published corpus == survivor set of its own published pair audit")
    assert(debris(out).isEmpty, s"swap debris after publish: ${debris(out)}")

    // ---- stage 2: the crawl grows — 300 genuinely new docs plus 200
    // exact re-crawls of existing texts under new ids (dedup pressure);
    // the rerun must republish the grown survivor set through the
    // per-partition swap, never append, and a reader the session cached
    // over the OLD corpus must serve the NEW rows afterwards
    val uniques = (0 until 300).map { i =>
      val text = s"volume rehearsal synthetic document number $i " +
        (0 until 40).map(w => s"token${i}x$w").mkString(" ")
      (1000000L + i, text, "en", "synthetic", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val recrawls = docs.orderBy("doc_id").limit(200)
      .withColumn("doc_id", col("doc_id") + lit(2000000L))
    val grown = docs.unionByName(uniques).unionByName(recrawls)
    val in2 = s"$root/in2"
    grown.write.parquet(s"$in2/documents.parquet")

    val cachedAcrossGrowth = spark.read.parquet(s"$out/corpus").cache()
    assert(cachedAcrossGrowth.count() == ids1.size) // materialize pre-swap
    CorpusMain.runWith(spark, in2, out)
    val expected2 = DedupOps.dedupeCorpus(grown,
      spark.read.parquet(s"$out/near_dup_pairs"))
      .select("doc_id").as[Long].collect().toSet
    val ids2 = spark.read.parquet(s"$out/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(ids2 == expected2, "growth rerun == grown survivor set")
    assert((ids2 -- ids1).nonEmpty, "growth must add survivors")
    assert(ids2.size > ids1.size && ids2.size < ids1.size + 500,
      s"plausible growth: ${ids1.size} -> ${ids2.size} (300 uniques " +
        "survive, the 200 exact re-crawls mostly dedupe away)")
    try assert(cachedAcrossGrowth.select("doc_id").as[Long].collect().toSet
        == ids2,
      "a cached reader over the corpus must serve the post-growth publish")
    finally cachedAcrossGrowth.unpersist()
    assert(debris(out).isEmpty, s"swap debris after growth: ${debris(out)}")

    // ---- stage 3: erasure at volume with the table cached in-session —
    // purgeCurated routes through deleteWhere, whose file discovery must
    // not be blinded by the cache (r18 fix) and whose publish coherence
    // must hold for the cached reader
    val purgeIds = ids2.toSeq.sorted.grouped(ids2.size / 50 max 1)
      .map(_.head).take(50).toSeq
    val cachedAcrossPurge = spark.read.parquet(s"$out/corpus").cache()
    assert(cachedAcrossPurge.count() == ids2.size)
    val report = CorpusMain.purgeCurated(spark, out, purgeIds)
    assert(report("corpus")._2 == purgeIds.size.toLong,
      s"every purged id was a live corpus row: ${report("corpus")}")
    val ids3 = spark.read.parquet(s"$out/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(ids3 == ids2 -- purgeIds, "survivors are exactly the rest")
    val pairsAfter = spark.read.parquet(s"$out/near_dup_pairs")
    assert(pairsAfter.filter(col("doc_a").isin(purgeIds.map(Long.box): _*) ||
        col("doc_b").isin(purgeIds.map(Long.box): _*)).count() == 0,
      "no audit row names a purged doc")
    try assert(cachedAcrossPurge.select("doc_id").as[Long].collect().toSet
        == ids3,
      "a cached reader over the corpus must not serve erased rows")
    finally cachedAcrossPurge.unpersist()
    // idempotence: a re-purge finds nothing and rewrites nothing
    val again = CorpusMain.purgeCurated(spark, out, purgeIds)
    assert(again.values.forall(_ == ((0, 0L))), again.toString)
    assert(debris(out).isEmpty, s"swap debris after erasure: ${debris(out)}")
  }
}
