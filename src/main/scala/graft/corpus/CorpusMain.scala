package graft.corpus

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.{DedupOps, TextOps}
import graft.sources.Warehouse

/** The LLM-data-pipeline capstone as a runnable entry point, shaped like
  * the six reference-script mains: read a documents table, near-dup-dedupe
  * it, split it deterministically, pack each split's token streams, and
  * publish idempotently through the same write-audit-publish warehouse
  * protocol the NBA pipeline uses.
  *
  * Outputs under `--output`:
  *   - `corpus/` — the deduped corpus with split/pack bookkeeping columns,
  *     partitioned by `split` (so a trainer reads `split=train` only —
  *     partition pruning is the point of the layout), published via
  *     per-partition swap (a rerun replaces, never duplicates);
  *   - `near_dup_pairs/` — the audit trail: every verified pair that
  *     caused a drop, published via directory swap.
  *
  * Every stage is one of the oracle-checked operators (q31, q39, q49,
  * q50) — this main only composes and publishes them.
  */
object CorpusMain {

  def main(argv: Array[String]): Unit = {
    val args = argv.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val bad = args.keySet -- Set("input", "output", "capacity")
    if (argv.length % 2 != 0 || bad.nonEmpty ||
        !args.contains("input") || !args.contains("output")) {
      System.err.println(
        "usage: graft.corpus.CorpusMain --input <dir> --output <dir> [--capacity N]")
      sys.exit(2)
    }
    val spark = graft.Sessions.local("graft-corpus")
    try runWith(spark, args("input"), args("output"),
      args.get("capacity").map(_.toInt))
    finally spark.stop()
  }

  /** The job body on a caller-owned session (testable; main owns its own). */
  def runWith(spark: SparkSession, input: String, output: String,
      capacity: Option[Int] = None): Unit = {
    val docs = spark.read.parquet(s"$input/documents.parquet")
    val sh = DedupOps.shingledOf(docs).persist()
    try {
      val pairs = DedupOps.minhashNearDup(sh).persist()
      try {
        // audit first: if the run dies after this publish, the pair
        // evidence is on disk and a rerun recomputes the same corpus
        Warehouse.replaceDir(pairs, s"$output/near_dup_pairs")
        val deduped = DedupOps.dedupeCorpus(docs, pairs)
        val split = TextOps.hashSplit(deduped).select("doc_id", "split")
        val withSplit = deduped.join(split, "doc_id")
        // pack per (split, source): a training stream never crosses a
        // split boundary, so offsets must restart inside each split
        val packed = capacity
          .map(c => TextOps.packWindows(withSplit, c, Seq("split", "source")))
          .getOrElse(TextOps.packWindows(withSplit, streamCols = Seq("split", "source")))
          .select("doc_id", "n_tokens", "offset", "bin")
        Warehouse.overwritePartitions(
          withSplit.join(packed, "doc_id"), s"$output/corpus", Seq("split"))
      } finally { pairs.unpersist(); () }
    } finally { sh.unpersist(); () }
  }
}
