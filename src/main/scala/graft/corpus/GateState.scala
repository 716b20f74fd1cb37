package graft.corpus

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Checkpoints
import graft.queries.{DedupOps, VectorOps}

/** The evolving curated-side state of the streaming ingest gate: what the
  * gate knows, at each micro-batch, about every document that must not be
  * duplicated again — the static corpus it started from PLUS every
  * document the stream itself has accepted so far. Closing that loop is
  * the point: a gate that only probes the static corpus lets a document
  * near-duplicating one accepted in an EARLIER batch sail through, and a
  * crawl stream is exactly where burst duplicates arrive.
  *
  * Layout — absorbed state is an accumulator SEPARATE from the base:
  *   - base (text shingles + MinHash band index, and optionally the
  *     hyperplane band index of the corpus's vectors) is checkpointed
  *     once at startup and never touched again;
  *   - each accepted batch's rows are unioned into the absorbed
  *     accumulator and re-checkpointed ([[absorb]]), releasing the
  *     previous generation's blocks — so the per-batch materialization
  *     cost is O(docs absorbed so far), never O(corpus), and the plan
  *     stays one union deep regardless of stream lifetime (the
  *     lineage-truncation discipline [[DedupOps.components]] uses).
  *     At rest, the same state is the (b, v)-bucketed index table the
  *     q48 notes prescribe; this class is its in-session form.
  *
  * Replay identity (what makes exactly-once hold end to end): the
  * absorbed accumulator's probe rows for the CURRENT batch's own doc_ids
  * are excluded per batch ([[probeIdx]], [[vectorGate]]) — never the
  * base's. A replayed batch (crash after publish + absorb-rebuild, before
  * the checkpoint commit) therefore curates against exactly the state it
  * saw the first time and republishes the identical batch directory,
  * instead of flagging its own published survivors as duplicates of
  * themselves. The exclusion also gives a re-delivered doc_id REPLACE
  * semantics rather than self-collision. [[absorb]] additionally keys on
  * the micro-batch id, so a batch folds into the accumulator exactly
  * once no matter how often it replays.
  *
  * Threading: mutated only inside `foreachBatch`, which Structured
  * Streaming runs serially per query — no synchronization needed.
  */
final class GateState private (
    baseSh: DataFrame,
    baseIdx: DataFrame,
    vecSide: Option[(DataFrame, Double, DataFrame)], // (vectors, threshold, base band idx)
    private var absSh: DataFrame,
    private var absIdx: DataFrame,
    private var absVecIdx: Option[DataFrame],
    private var absorbedBatches: Set[Long],
    private var absBlocks: Seq[RDD[_]]) {

  /** Full shingled corpus (base + absorbed) — the exact-Jaccard
    * verification side of the text gate. No exclusion needed: candidates
    * only arise from the (already filtered) probe index. */
  def corpusSh: DataFrame = baseSh.unionByName(absSh)

  /** The text-gate probe index for one batch: base + absorbed, minus the
    * absorbed rows of the batch's own doc_ids (replay identity — see the
    * class note). `batchIds` is one micro-batch's (doc_id) frame: small
    * by definition, hence the broadcast anti-join. */
  def probeIdx(batchIds: DataFrame): DataFrame =
    baseIdx.unionByName(absIdx.join(
      broadcast(batchIds.select(col("doc_id").as("corpus_id"))),
      Seq("corpus_id"), "left_anti"))

  /** Whether a vector side was configured (`--embeddings`). */
  def hasVectors: Boolean = vecSide.nonEmpty

  /** The vector-space gate over one batch's text-surviving docs: drop
    * every doc whose embedding near-duplicates (cosine >= threshold) a
    * corpus or previously-accepted vector ([[VectorOps.lshNearDupAgainstIndex]]),
    * then collapse intra-batch vector near-dup clusters to one canonical
    * ([[VectorOps.lshNearDup]] + star components — cosine similarity
    * chains, so diameter is unknown). Docs with no row in the vectors
    * table pass untouched: an embedding-less doc has nothing to compare.
    * Identity when no vector side is configured. */
  def vectorGate(curated: DataFrame, batchIds: DataFrame): DataFrame =
    vecSide match {
      case None => curated
      case Some((vecs, threshold, baseVecIdx)) =>
        val incVecs = vecs.join(
          curated.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
        val idx = baseVecIdx.unionByName(absVecIdx.get.join(
          broadcast(batchIds.select(col("doc_id").as("corpus_id"))),
          Seq("corpus_id"), "left_anti"))
        val flagged = VectorOps.lshNearDupAgainstIndex(incVecs, idx, vecs, threshold)
          .select(col("vec_id").as("doc_id")).distinct()
        val survived = curated.join(flagged, Seq("doc_id"), "left_anti")
        val survVecs = incVecs.join(
          flagged.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_anti")
        val pairs = VectorOps.lshNearDup(survVecs, threshold)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
        DedupOps.dedupeCorpus(survived, pairs, star = true)
    }

  /** Fold one published batch's accepted docs into the absorbed
    * accumulator so every LATER batch is gated against them. `published`
    * is read back from the batch's published directory ((doc_id, text)
    * suffice) — the on-disk truth, which also severs any lineage back to
    * the stream source. Idempotent per `batchId`: a replayed batch never
    * double-folds. */
  def absorb(batchId: Long, published: DataFrame): Unit = {
    if (!absorbedBatches(batchId)) {
      val freshSh = DedupOps.shingledOf(published)
      val newSh = absSh.unionByName(freshSh).localCheckpoint(true)
      val newIdx = absIdx.unionByName(DedupOps.corpusBandIndex(freshSh))
        .localCheckpoint(true)
      val newVecIdx = vecSide.map { case (vecs, _, _) =>
        absVecIdx.get.unionByName(VectorOps.vectorBandIndex(vecs.join(
            published.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")))
          .localCheckpoint(true)
      }
      // the new generation is self-contained — the previous one's blocks
      // are dead weight and released NOW, not left to the ContextCleaner
      absBlocks.foreach(_.unpersist(false))
      absSh = newSh
      absIdx = newIdx
      absVecIdx = newVecIdx
      absorbedBatches += batchId
      absBlocks = (Seq(newSh, newIdx) ++ newVecIdx).flatMap(Checkpoints.rddsOf)
    }
  }

  /** Release every block this state holds (base + absorbed + the vectors
    * persist). The state is unusable afterwards. */
  def close(): Unit = {
    (Seq(baseSh, baseIdx) ++ vecSide.map(_._3)).flatMap(Checkpoints.rddsOf)
      .foreach(_.unpersist(false))
    absBlocks.foreach(_.unpersist(false))
    vecSide.foreach { case (vecs, _, _) => vecs.unpersist(); () }
  }
}

object GateState {

  /** Build the gate state at stream startup.
    *
    * `corpus`: the curated static corpus — (doc_id, text) at minimum.
    * `published`: docs from batch directories already published by a
    * PREVIOUS incarnation of this stream (restart path) — they are
    * part of the curated output and must gate later batches exactly like
    * the corpus does; `absorbedBatchIds` names their batch ids so a
    * replayed batch is recognized. `vectors`: the (vec_id, e, nrm)
    * embeddings table and the cosine near-dup threshold — enables the
    * vector-space gate; incoming AND corpus docs are looked up in it by
    * id (embeddings are computed upstream of the gate, keyed by doc id).
    */
  def build(corpus: DataFrame,
      published: Option[DataFrame] = None,
      absorbedBatchIds: Set[Long] = Set.empty,
      vectors: Option[(DataFrame, Double)] = None,
      baseIndex: Option[DataFrame] = None,
      baseShingles: Option[DataFrame] = None,
      baseVecIndex: Option[DataFrame] = None,
      persistVectors: Boolean = true): GateState = {
    // a prebuilt vector index with no vector side would be silently
    // ignored — the same config bug the mains' orphan-flag rule catches
    require(baseVecIndex.isEmpty || vectors.nonEmpty,
      "baseVecIndex was given without vectors: it would be silently ignored")
    // `baseShingles`: the shingled corpus AT REST (the doc_id-bucketed
    // table [[DedupOps.writeCorpusShingles]] wrote) — skips the startup
    // shingling fold AND the corpus-sized checkpoint; the verify join
    // reads the at-rest layout per batch instead of executor memory.
    val baseSh = baseShingles.getOrElse(
      DedupOps.shingledOf(corpus).localCheckpoint(true))
    // `baseIndex`: the corpus band index AT REST — the (b, v)-bucketed
    // table [[DedupOps.writeCorpusBandIndex]] wrote. Passing it skips the
    // startup 8-hash fold over the corpus AND keeps the probe join
    // exchange-free on the index side (checkpointing would destroy the
    // bucketed layout, so the at-rest frame is used as-is). The absorbed
    // accumulator still unions in per batch; at rest, absorbed deltas are
    // compacted back into the table whenever the corpus republishes.
    val baseIdx = baseIndex.getOrElse(
      DedupOps.corpusBandIndex(baseSh).localCheckpoint(true))
    val seed = published.getOrElse(corpus.limit(0))
    val absSh = DedupOps.shingledOf(seed).localCheckpoint(true)
    val absIdx = DedupOps.corpusBandIndex(absSh).localCheckpoint(true)
    val vecSide = vectors.map { case (vecsRaw, threshold) =>
      // persisted because every batch scans it twice (incoming lookup +
      // candidate verification). At corpus scale persisting the WHOLE
      // vectors table is the wrong trade — pass `persistVectors = false`
      // with the vec_id-bucketed at-rest table instead
      // (CorpusMain --publish-vectors / stream --vectors-table): both
      // per-batch joins then probe the at-rest layout, the same move
      // corpusBandIndex makes at rest.
      val vecs = if (persistVectors) vecsRaw.persist() else vecsRaw
      // `baseVecIndex`: the vector band index AT REST — the (b, v)-bucketed
      // table [[VectorOps.writeVectorBandIndex]] wrote. Same contract as
      // `baseIndex` on the text side: skips the startup hyperplane fold
      // over the corpus's vectors AND keeps the per-batch band probe
      // exchange-free on the index side (used as-is — checkpointing would
      // destroy the bucketed layout).
      val baseVecIdx = baseVecIndex.getOrElse(
        VectorOps.vectorBandIndex(vecs.join(
            corpus.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"))
          .localCheckpoint(true))
      (vecs, threshold, baseVecIdx)
    }
    val absVecIdx = vecSide.map { case (vecs, _, _) =>
      VectorOps.vectorBandIndex(vecs.join(
          seed.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"))
        .localCheckpoint(true)
    }
    new GateState(baseSh, baseIdx, vecSide, absSh, absIdx, absVecIdx,
      absorbedBatchIds,
      (Seq(absSh, absIdx) ++ absVecIdx).flatMap(Checkpoints.rddsOf))
  }

  /** [[build]] for a (re)starting stream: heal any interrupted swap under
    * `output`, then fold every `batch=<id>` directory a previous
    * incarnation published into the absorbed side — those docs are
    * curated output and must gate later batches exactly like the corpus;
    * their batch ids are recorded so a replayed batch is recognized.
    * One definition shared by the main and the specs, so the restart
    * semantics cannot drift between them. */
  def resume(spark: org.apache.spark.sql.SparkSession, corpus: DataFrame,
      output: String,
      vectors: Option[(DataFrame, Double)] = None,
      baseIndex: Option[DataFrame] = None,
      baseShingles: Option[DataFrame] = None,
      baseVecIndex: Option[DataFrame] = None,
      persistVectors: Boolean = true): GateState = {
    graft.sources.Warehouse.recover(spark, output)
    val batchDirs = Option(new java.io.File(output).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    val published =
      if (batchDirs.isEmpty) None
      else Some(spark.read.parquet(batchDirs.map(_.getPath): _*)
        .select("doc_id", "text"))
    build(corpus, published,
      batchDirs.map(_.getName.stripPrefix("batch=").toLong).toSet, vectors,
      baseIndex, baseShingles, baseVecIndex, persistVectors)
  }
}
