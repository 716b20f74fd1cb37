package graft.queries

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The LLM-data-pipeline operators composed end-to-end on real testdata:
  * near-dup detection -> corpus dedup -> gate -> split -> packing. Pins the
  * cross-operator invariants a production pipeline relies on, not any one
  * operator's output values (those are oracle-checked per query).
  */
class CorpusPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)

  test("dedupeCorpus is a fixpoint: the detector finds nothing on the deduped corpus") {
    val pairs = DedupOps.minhashNearDup(DedupOps.shingledOf(docs))
    assert(pairs.count() > 0, "no near-dups at sf0.001 — the fixpoint test is vacuous")
    val deduped = DedupOps.dedupeCorpus(docs, pairs)
    // every surviving near-dup pair would have been an edge before, so its
    // endpoints shared a component and only one canonical survived — the
    // second detection pass must come up empty (dedup idempotence)
    val again = DedupOps.minhashNearDup(DedupOps.shingledOf(deduped))
    assert(again.isEmpty, "dedup must be idempotent — second pass found pairs")
    // and the gate agrees: the deduped corpus gated against itself (minus
    // identity) is how an incremental pipeline would re-admit it — empty too
    assert(DedupOps.dedupeCorpus(deduped, again).count() == deduped.count())
  }

  test("dedupe -> split -> pack composes: splits partition the corpus, packing conserves tokens") {
    val deduped = DedupOps.dedupeCorpus(docs,
      DedupOps.minhashNearDup(DedupOps.shingledOf(docs)))
    val split = TextOps.hashSplit(deduped)
    // every surviving doc lands in exactly one split
    assert(split.count() == deduped.count())
    assert(split.groupBy("doc_id").count().filter(col("count") > 1).isEmpty)
    // pack only the train split: window bookkeeping must conserve tokens —
    // for each source, max(offset + n_tokens) == sum(n_tokens)
    val train = deduped.join(
      split.filter(col("split") === "train").select("doc_id"), "doc_id")
    val packed = TextOps.packWindows(train)
    val conservation = packed.groupBy("source")
      .agg(max(col("offset") + col("n_tokens")).as("stream_end"),
        sum(col("n_tokens")).as("total"))
      .filter(col("stream_end") =!= col("total"))
    assert(conservation.isEmpty, "packing lost or duplicated tokens")
    // bins are dense 0..max per source: bin count ~ ceil(total/capacity)
    val bad = packed.groupBy("source")
      .agg(countDistinct(col("bin")).as("bins"), max(col("bin")).as("maxBin"))
      .filter(col("bins") =!= col("maxBin") + 1)
    assert(bad.isEmpty, "bins must be dense per source")
  }
}
