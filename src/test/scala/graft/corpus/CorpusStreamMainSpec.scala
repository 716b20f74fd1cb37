package graft.corpus

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.DedupOps

/** The streaming corpus front door end-to-end: two micro-batches through
  * mix -> near-dup gate -> split -> idempotent per-batch publish, equal to
  * the batch curation of the same rows, with replay-safe output. */
class CorpusStreamMainSpec extends SparkSpec {
  import spark.implicits._

  private val corpusRows = Seq(
    (1000L, "src0", "alpha beta gamma delta epsilon zeta eta theta"),
    (1001L, "src0", "one two three four five six seven eight"))

  test("two micro-batches: gate drops corpus dups, split stamped, output == batch curation") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("stream_gate").toString
    val ckpt = Files.createTempDirectory("stream_gate_ckpt").toString
    val corpusSh = DedupOps.shingledOf(
      corpusRows.toDF("doc_id", "source", "text")).persist()
    val incoming = Seq(
      // batch 1: one dup of corpus 1000, one clean doc
      (1L, "src0", "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "src0", "completely fresh words nothing like the corpus here"),
      // batch 2: one dup of corpus 1001, one clean doc
      (3L, "src1", "one two three four five six seven eight"),
      (4L, "src1", "another clean document with its own novel content"))
    val in = MemoryStream[(Long, String, String)]
    val q = CorpusStreamMain.start(
      in.toDF().toDF("doc_id", "source", "text"), corpusSh, out, ckpt)
    try {
      in.addData(incoming.take(2): _*)
      q.processAllAvailable()
      in.addData(incoming.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    corpusSh.unpersist()

    // per-batch directories exist (the idempotence unit is the batch dir)
    val batchDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).sorted
    assert(batchDirs.length == 2, batchDirs.mkString(","))

    // the union of published batches == batch curation of all rows: dups
    // of the corpus dropped exactly once, clean docs kept with their split
    val got = spark.read.parquet(s"$out/batch=*")
      .select("doc_id", "source", "split")
      .as[(Long, String, String)].collect().toSet
    val batchOracle = CorpusStreamMain.curateBatch(
        incoming.toDF("doc_id", "source", "text"), DedupOps.shingledOf(
          corpusRows.toDF("doc_id", "source", "text")))
      .select("doc_id", "source", "split")
      .as[(Long, String, String)].collect().toSet
    assert(got == batchOracle, "stream and batch curation must agree")
    assert(got.map(_._1) == Set(2L, 4L), s"dups 1 and 3 must be gated out: $got")
    assert(got.forall(r => Set("train", "val", "test")(r._3)))
  }

  test("file-source restart resumes from the checkpoint: old files not reprocessed") {
    val root = Files.createTempDirectory("stream_gate_restart").toString
    val (inDir, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    new java.io.File(inDir).mkdirs()
    val corpusSh = DedupOps.shingledOf(
      corpusRows.toDF("doc_id", "source", "text")).persist()
    val schema = Seq((0L, "s", "t")).toDF("doc_id", "source", "text").schema
    def drop(name: String, rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "source", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$inDir/$name")
    def restartAndDrain(): Unit = {
      val q = CorpusStreamMain.start(
        spark.readStream.schema(schema).option("recursiveFileLookup", "true")
          .parquet(inDir), corpusSh, out, ckpt)
      try { q.processAllAvailable() } finally q.stop()
    }
    try {
      drop("crawl0", Seq((10L, "src0", "first crawl delivers this clean document")))
      restartAndDrain()
      drop("crawl1", Seq((11L, "src0", "second crawl delivers another clean one")))
      restartAndDrain()
      // the restarted query processed ONLY the new file (the checkpoint
      // remembers crawl0), so doc 10 appears exactly once across all
      // published batch dirs — exactly-once across restarts, end to end
      val got = spark.read.parquet(s"$out/batch=*")
        .select("doc_id").as[Long].collect().toSeq
      assert(got.sorted == Seq(10L, 11L), s"expected each doc once, got $got")
    } finally { corpusSh.unpersist(); () }
  }

  test("publishBatch replay replaces its own batch dir (exactly-once under retry)") {
    val out = Files.createTempDirectory("stream_gate_replay").toString
    val corpusSh = DedupOps.shingledOf(
      corpusRows.toDF("doc_id", "source", "text"))
    val rows = Seq((7L, "src0", "a perfectly clean novel document body"))
      .toDF("doc_id", "source", "text")
    val curated = CorpusStreamMain.curateBatch(rows, corpusSh)
    CorpusStreamMain.publishBatch(curated, out, 0L)
    // sink replay after a crash-before-checkpoint re-delivers the batch
    CorpusStreamMain.publishBatch(curated, out, 0L)
    val got = spark.read.parquet(s"$out/batch=0")
    assert(got.count() == 1, "replay must replace, not append")
    assert(got.select("doc_id").first().getLong(0) == 7L)
  }

  test("curation is batching-transparent: any chop of the crawl yields the same union") {
    val corpusSh = DedupOps.shingledOf(
      corpusRows.toDF("doc_id", "source", "text"))
    val rows = (0L until 12L).map { i =>
      val text = if (i % 4 == 0) corpusRows(0)._3 // a corpus dup
        else s"novel content body number $i with several distinct words"
      (i, s"src${i % 2}", text)
    }
    def curate(batch: Seq[(Long, String, String)]) =
      CorpusStreamMain.curateBatch(
          batch.toDF("doc_id", "source", "text"), corpusSh,
          mixRates = Seq("src1" -> "7f"))
        .select("doc_id", "split").as[(Long, String)].collect().toSet
    val whole = curate(rows)
    // three chops: halves, alternating rows, one row per batch — every
    // per-document stage (mix, gate, split) must ignore batch boundaries
    val chops = Seq(
      Seq(rows.take(6), rows.drop(6)),
      Seq(rows.zipWithIndex.filter(_._2 % 2 == 0).map(_._1),
        rows.zipWithIndex.filter(_._2 % 2 == 1).map(_._1)),
      rows.map(Seq(_)))
    for (chop <- chops)
      assert(chop.map(curate).reduce(_ ++ _) == whole,
        s"curation changed under a ${chop.length}-batch chop")
  }

  test("a benchmark set decontaminates each batch before the gate") {
    val corpusSh = DedupOps.shingledOf(
      corpusRows.toDF("doc_id", "source", "text"))
    val benchText = "held out evaluation prompt nobody may train on ever"
    val benchSet = DedupOps.benchShingleSet(DedupOps.shingledOf(
      Seq((9000L, benchText)).toDF("doc_id", "text")))
    val rows = Seq(
      (20L, "src0", benchText),                                   // verbatim bench copy
      (21L, "src0", "an unrelated clean document body right here"),
      (22L, "src0", corpusRows(0)._3))                            // corpus dup
      .toDF("doc_id", "source", "text")
    val kept = CorpusStreamMain.curateBatch(rows, corpusSh,
        benchSet = Some(benchSet))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(21L),
      s"bench copy (20) and corpus dup (22) must both drop, got $kept")
    // without the bench set, only the corpus dup drops
    val noBench = CorpusStreamMain.curateBatch(rows, corpusSh)
      .select("doc_id").as[Long].collect().toSet
    assert(noBench == Set(20L, 21L))
    // guard parity with the batch twin: a threshold without its stage
    // fails loudly programmatically, not only at the CLI
    intercept[IllegalArgumentException] {
      CorpusStreamMain.curateBatch(rows, corpusSh, minHits = 5L)
    }
    intercept[IllegalArgumentException] {
      CorpusStreamMain.curateBatch(rows, corpusSh,
        benchSet = Some(benchSet), minHits = 0L)
    }
  }

  test("a prebuilt persisted corpus band index curates identically to the default") {
    val corpusSh = DedupOps.shingledOf(
      corpusRows.toDF("doc_id", "source", "text"))
    val rows = Seq(
      (40L, "src0", corpusRows(1)._3),                            // corpus dup
      (41L, "src0", "completely novel content for this document"))
      .toDF("doc_id", "source", "text")
    val idx = DedupOps.corpusBandIndex(corpusSh).persist()
    try {
      val withIdx = CorpusStreamMain.curateBatch(rows, corpusSh,
          corpusIndex = Some(idx))
        .select("doc_id", "split").as[(Long, String)].collect().toSet
      val default = CorpusStreamMain.curateBatch(rows, corpusSh)
        .select("doc_id", "split").as[(Long, String)].collect().toSet
      assert(withIdx == default, "prebuilt index must not change the gate")
      assert(withIdx.map(_._1) == Set(41L))
    } finally { idx.unpersist(); () }
  }

  test("the per-batch plan broadcasts the bench set and plans no cartesian") {
    val corpusSh = DedupOps.shingledOf(
      corpusRows.toDF("doc_id", "source", "text"))
    val benchSet = DedupOps.benchShingleSet(DedupOps.shingledOf(
      Seq((9000L, "held out evaluation prompt text here")).toDF("doc_id", "text")))
    val rows = Seq((30L, "src0", "a document body to curate and publish"))
      .toDF("doc_id", "source", "text")
    // noAutoBroadcast: a BroadcastHashJoin can then only come from the
    // explicit broadcast(benchSet) hint this test exists to pin
    val plan = noAutoBroadcast {
      CorpusStreamMain.curateBatch(rows, corpusSh, benchSet = Some(benchSet))
        .queryExecution.executedPlan.toString
    }
    // this plan runs once per micro-batch forever: the bench overlap must
    // stay a broadcast join (the corpus-side rows never shuffle for it)
    // and nothing may degrade to a cartesian product
    assert(plan.contains("BroadcastHashJoin"), "bench join must broadcast")
    assert(!plan.contains("CartesianProduct"), "cartesian in the gate plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "degenerate join in the gate plan")
  }

  test("mix rates apply per batch before the gate (unlisted sources kept)") {
    val corpusSh = DedupOps.shingledOf(
      corpusRows.toDF("doc_id", "source", "text"))
    val rows = (0L until 64L)
      .map(i => (i, if (i % 2 == 0) "srcA" else "srcB", s"unique row body number $i with more words"))
      .toDF("doc_id", "source", "text")
    val curated = CorpusStreamMain.curateBatch(rows, corpusSh,
      mixRates = Seq("srcA" -> "33"))
    val bySrc = curated.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc.getOrElse("srcB", 0L) == 32L, "unlisted source sampled")
    assert(bySrc.getOrElse("srcA", 0L) < 32L, "listed source not sampled")
  }
}
