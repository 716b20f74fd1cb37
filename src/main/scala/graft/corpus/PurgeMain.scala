package graft.corpus

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Warehouse

/** The erasure request as ONE runnable command — the operational face of
  * the right-to-be-forgotten story the library otherwise exposes as three
  * composable APIs. A deployment that curated with [[CorpusMain]], gated
  * with [[CorpusStreamMain]], and keeps extra warehouse copies must purge
  * a document from ALL of them, and "compose three calls correctly, every
  * time, under an audit deadline" is exactly the kind of operational step
  * that gets half-done; this main runs the full composition and prints
  * the per-store evidence:
  *
  *   - `--curation <dir>`: [[CorpusMain.purgeCurated]] over the batch
  *     pipeline's published estate (corpus + text-bearing side outputs +
  *     audits, mirror/stats re-derived);
  *   - `--index-table/--shingles-table/--vector-index-table/
  *     --vectors-table/--stream-output`: [[GateState.purgeDocs]] over the
  *     gate's at-rest state and the stream's published batch dirs;
  *   - `--table <dir>` (with `--id-col`, default doc_id): a plain
  *     [[graft.sources.Warehouse.deleteWhere]] against one extra
  *     warehouse directory table — the escape hatch for copies the two
  *     pipelines do not know about.
  *
  * At least one target group is required (an erasure that names no store
  * is a config bug, the fail-loudly rule every corpus main applies).
  * Idempotent end to end — a rerun reports (0, 0) everywhere. Same
  * single-maintenance-writer assumption as deleteWhere: run with the
  * stream down and no concurrent curation. */
object PurgeMain {

  def main(argv: Array[String]): Unit = {
    val usage = "usage: graft.corpus.PurgeMain --ids 1,2,3 " +
      "[--curation <dir>] [--table <dir>] [--id-col <col>] " +
      "[--index-table <t>] [--shingles-table <t>] " +
      "[--vector-index-table <t>] [--vectors-table <t>] " +
      "[--stream-output <dir>] [--max-concurrent-files N]"
    val args = Cli.parseArgs(argv,
      allowed = Set("ids", "curation", "table", "id-col", "index-table",
        "shingles-table", "vector-index-table", "vectors-table",
        "stream-output", "max-concurrent-files"),
      required = Set("ids"),
      usage = usage)
    val ids = args("ids").split(',').toSeq.map { s =>
      try s.trim.toLong
      catch { case _: NumberFormatException =>
        System.err.println(s"bad --ids entry '$s' (want a doc id)")
        System.err.println(usage)
        sys.exit(2)
      }
    }
    val maxFiles = Cli.toInt(args, "max-concurrent-files", usage).getOrElse(8)
    // validated HERE, not left to deleteWhere's require mid-purge: a
    // malformed value is a usage error and must exit 2 with the usage
    // line (Cli's contract), not a stack trace after JVM startup
    if (maxFiles < 1) {
      System.err.println(s"bad --max-concurrent-files value '$maxFiles' (want >= 1)")
      System.err.println(usage)
      sys.exit(2)
    }
    // an orphan tuning flag is always a config bug (CorpusMain's rule)
    if (args.contains("id-col") && !args.contains("table")) {
      System.err.println("--id-col was given without --table: it would be silently ignored")
      sys.exit(2)
    }
    val spark = graft.Sessions.local("graft-purge")
    try {
      val report = runWith(spark, ids,
        curation = args.get("curation"),
        table = args.get("table"),
        idCol = args.getOrElse("id-col", "doc_id"),
        indexTable = args.get("index-table"),
        shinglesTable = args.get("shingles-table"),
        vectorIndexTable = args.get("vector-index-table"),
        vectorsTable = args.get("vectors-table"),
        streamOutput = args.get("stream-output"),
        maxConcurrentFiles = maxFiles)
      report.toSeq.sortBy(_._1).foreach { case (store, (files, rows)) =>
        println(s"purged $store: files_rewritten=$files rows_deleted=$rows")
      }
    } finally spark.stop()
  }

  /** The job body on a caller-owned session (testable; main owns its
    * own). Returns the union of the per-store reports, each entry
    * prefixed by its target group so two groups naming the same store
    * name cannot collide. */
  def runWith(spark: SparkSession, ids: Seq[Long],
      curation: Option[String] = None,
      table: Option[String] = None,
      idCol: String = "doc_id",
      indexTable: Option[String] = None,
      shinglesTable: Option[String] = None,
      vectorIndexTable: Option[String] = None,
      vectorsTable: Option[String] = None,
      streamOutput: Option[String] = None,
      maxConcurrentFiles: Int = 8): Map[String, (Int, Long)] = {
    require(ids.nonEmpty, "need at least one doc id to purge")
    val gateNamed = indexTable.nonEmpty || shinglesTable.nonEmpty ||
      vectorIndexTable.nonEmpty || vectorsTable.nonEmpty || streamOutput.nonEmpty
    require(curation.nonEmpty || table.nonEmpty || gateNamed,
      "nothing to purge: name a curation root, a gate store, or a table " +
        "(an erasure that names no store is a config bug)")
    val curated = curation.toSeq.flatMap(dir =>
      CorpusMain.purgeCurated(spark, dir, ids, maxConcurrentFiles)
        .map { case (k, v) => s"curation/$k" -> v })
    val gate =
      if (!gateNamed) Seq.empty
      else GateState.purgeDocs(spark, ids, indexTable, shinglesTable,
        vectorIndexTable, vectorsTable, streamOutput, maxConcurrentFiles)
        .map { case (k, v) => s"gate/$k" -> v }.toSeq
    val extra = table.toSeq.map(dir =>
      s"table/$dir" -> Warehouse.deleteWhere(spark, dir,
        col(idCol).isin(ids.distinct.map(Long.box): _*), maxConcurrentFiles))
    (curated ++ gate ++ extra).toMap
  }
}
