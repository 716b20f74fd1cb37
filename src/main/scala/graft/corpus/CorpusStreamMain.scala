package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.{DedupOps, TextOps}
import graft.sources.Warehouse

/** The corpus-ingest gate as a running stream: every arriving crawl batch
  * is mixed (domain-reweighted), gated against the already-curated static
  * corpus (near-dup drop via the q48 MinHash-band gate), stamped with its
  * deterministic split, and appended — the always-on front door whose
  * offline twin is [[CorpusMain]].
  *
  * Shape: `foreachBatch`, the Spark-native way to run an ingest pipeline
  * whose per-document logic is pure batch semantics. Each micro-batch is
  * curated by the SAME oracle-checked operators the batch pipeline uses
  * (q52 mixFilter -> q48 gate -> q49 splitColumn — composition, zero
  * forked logic, so stream and batch curation cannot drift), then
  * published under `batch=<id>/` via the crash-safe directory swap:
  * a replayed micro-batch (failure before the checkpoint commit)
  * REPLACES its own directory instead of appending duplicates, which is
  * what turns the sink's at-least-once replay into exactly-once output.
  * The corpus-side band index is built and persisted ONCE (outside the
  * per-batch path) and every batch joins against those cached blocks —
  * at scale this is the (b, v)-keyed bucketed table the q48 notes
  * prescribe.
  *
  * Statelessness of the in-plan gate (no watermark, no state store) is
  * pinned by StreamOpsSpec; this main adds the end-to-end composition +
  * exactly-once publish, pinned by CorpusStreamMainSpec.
  */
object CorpusStreamMain {

  /** One micro-batch's curation — pure batch logic, shared verbatim with
    * the spec's batch-equality oracle. `corpusSh` is the shingled static
    * corpus (persist it; it is read once per batch otherwise); `benchSet`
    * is the optional prebuilt [[DedupOps.benchShingleSet]] — docs
    * overlapping it at or above `minHits` shingles are dropped on arrival
    * (the same q51 decontamination the batch pipeline applies offline;
    * eval sets are small, so the stage is the broadcast semi-join
    * contamination's scaladoc prescribes — `broadcastBench = false` is
    * the hard-promise escape hatch for a set past the broadcast limit). */
  def curateBatch(batch: DataFrame, corpusSh: DataFrame,
      mixRates: Seq[(String, String)] = Seq.empty,
      mixDefault: String = "ff",
      benchSet: Option[DataFrame] = None,
      minHits: Long = 1L,
      broadcastBench: Boolean = true,
      corpusIndex: Option[DataFrame] = None): DataFrame = {
    // same guards as the batch twin (CorpusMain.runWith): a threshold
    // without its stage must fail loudly, programmatically too
    require(minHits >= 1, s"min-hits must be >= 1, got $minHits")
    require(minHits == 1L || benchSet.nonEmpty,
      s"minHits=$minHits was given without a benchSet to threshold")
    val mixed =
      if (mixRates.isEmpty && mixDefault == "ff") batch
      else TextOps.mixFilter(batch, mixRates, mixDefault)
    val mixedSh = DedupOps.shingledOf(mixed)
    // decontamination drops ids from BOTH frames via the same anti-join,
    // so the gate reuses the one shingle pass instead of re-shingling the
    // survivors (the hot stage of the always-on path)
    val (decontaminated, decontaminatedSh) = benchSet match {
      case Some(b) =>
        val hot = DedupOps.contaminationAgainstSet(mixedSh, b, broadcastBench)
          .filter(col("n_hits") >= minHits).select("doc_id")
        (mixed.join(hot, Seq("doc_id"), "left_anti"),
          mixedSh.join(hot, Seq("doc_id"), "left_anti"))
      case None => (mixed, mixedSh)
    }
    // the gate emits verified (doc, corpus_doc) pairs; a doc matching
    // SEVERAL corpus docs must still drop exactly once, so the anti-join
    // keys on the distinct flagged ids. The corpus band index — the
    // 8-hash signature fold over the ENTIRE corpus — is the dominant
    // repeated cost of an always-on gate, so a caller passes the prebuilt
    // persisted one; the default rebuilds it (small/batch use).
    val flagged = DedupOps
      .nearDupAgainstIndex(decontaminatedSh,
        corpusIndex.getOrElse(DedupOps.corpusBandIndex(corpusSh)), corpusSh)
      .select(col("doc_id")).distinct()
    decontaminated.join(flagged, Seq("doc_id"), "left_anti")
      .withColumn("split", TextOps.splitColumn(col("doc_id")))
  }

  /** Idempotent per-batch publish: `batch=<id>` is swapped whole, so a
    * replay of the same micro-batch id replaces its own output. */
  def publishBatch(curated: DataFrame, output: String, batchId: Long): Unit =
    Warehouse.replaceDir(curated, s"$output/batch=$batchId")

  /** Wire a (streaming) crawl frame through the gate and start the query.
    * Caller owns the corpus/bench shingle persist lifecycles. */
  def start(incoming: DataFrame, corpusSh: DataFrame, output: String,
      checkpoint: String, mixRates: Seq[(String, String)] = Seq.empty,
      mixDefault: String = "ff", benchSet: Option[DataFrame] = None,
      minHits: Long = 1L, broadcastBench: Boolean = true,
      corpusIndex: Option[DataFrame] = None): StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        publishBatch(
          curateBatch(b, corpusSh, mixRates, mixDefault, benchSet, minHits,
            broadcastBench, corpusIndex),
          output, id)
      }
      .start()

  /** Bookkeeping columns the BATCH pipeline appends on publish — never
    * part of a crawl delivery, so they must not leak into the ingest
    * schema when `--corpus` points at CorpusMain's own published output
    * (the intended pairing): locking the stream to the full published
    * schema would materialize them as always-null columns that read as
    * real pack/split metadata downstream. */
  private val PublishBookkeeping = Set("n_tokens", "offset", "bin", "bucket", "split")

  def main(argv: Array[String]): Unit = {
    val args = Cli.parseArgs(argv,
      allowed = Set("input", "corpus", "output", "checkpoint", "mix",
        "mix-default", "bench", "min-hits", "broadcast-bench", "recursive"),
      required = Set("input", "corpus", "output", "checkpoint"),
      usage = "usage: graft.corpus.CorpusStreamMain --input <stream-dir> " +
        "--corpus <parquet> --output <dir> --checkpoint <dir> " +
        "[--mix src0:ff,src1:7f] [--mix-default <hex-pair>] " +
        "[--bench <parquet>] [--min-hits N] [--broadcast-bench true|false] " +
        "[--recursive true|false]")
    // same orphan-flag rule as CorpusMain: a flag without its stage
    // would be silently ignored
    for (orphan <- Seq("min-hits", "broadcast-bench"))
      if (args.contains(orphan) && !args.contains("bench")) {
        System.err.println(
          s"--$orphan was given without --bench: it would be silently ignored")
        sys.exit(2)
      }
    val rates = args.get("mix").map(Cli.parseMix).getOrElse(Seq.empty)
    val spark = graft.Sessions.local("graft-corpus-stream")
    try {
      val corpus = spark.read.parquet(args("corpus"))
      val corpusSh = DedupOps.shingledOf(corpus).persist()
      // the corpus band index is the gate's probe side and the dominant
      // per-batch cost if rebuilt: build it once, persist it, and every
      // micro-batch joins against the cached blocks (the scaladoc's
      // "built and persisted ONCE" promise, made real)
      val corpusIdx = DedupOps.corpusBandIndex(corpusSh).persist()
      // the DISTINCT exploded shingle set is what contamination joins on:
      // persist that, so each micro-batch reuses the built set instead of
      // re-paying explode + distinct (+ the broadcast build) forever
      val benchSet = args.get("bench").map(b => DedupOps.benchShingleSet(
        DedupOps.shingledOf(spark.read.parquet(b))).persist())
      // the file source delivers each new parquet file dropped into
      // --input as (part of) a micro-batch; its schema is the corpus's
      // CONTENT columns (the crawl shape), not the published bookkeeping.
      // --recursive (default true): a crawl delivery is usually a
      // DIRECTORY (the only thing a Spark writer can produce), and
      // without recursive lookup every directory-shaped delivery is
      // silently invisible forever. The trade: recursive lookup disables
      // partition-DIRECTORY inference, so a producer who encodes a column
      // in `key=value/` directory names (write.partitionBy) must pass
      // `--recursive false` and deliver at the top level — otherwise that
      // column arrives null. Flat-file and plain-subdirectory deliveries
      // (columns stored IN the files) want the default.
      val recursive = args.get("recursive").forall(_.toBoolean)
      val ingestSchema = org.apache.spark.sql.types.StructType(
        corpus.schema.filterNot(f => PublishBookkeeping(f.name)))
      val incoming = spark.readStream
        .schema(ingestSchema)
        .option("recursiveFileLookup", recursive.toString)
        .parquet(args("input"))
      val q = start(incoming, corpusSh, args("output"), args("checkpoint"),
        rates, args.getOrElse("mix-default", "ff"), benchSet,
        args.get("min-hits").map(_.toLong).getOrElse(1L),
        args.get("broadcast-bench").forall(_.toBoolean),
        corpusIndex = Some(corpusIdx))
      q.awaitTermination()
    } finally spark.stop()
  }
}
