package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines source/sink for document corpora — the wire format crawl
  * dumps actually arrive in. Reads are SCHEMA-LOCKED (inference over a
  * 100 TB dump would be a full extra pass, and a schema drift would merge
  * silently) and carry a QUARANTINE channel: a line that is malformed OR
  * parses with a null in a required column becomes a (line, file) row
  * instead of killing the job, silently vanishing, or — worse —
  * publishing: a null-text document is invisible to every shingle-based
  * gate (dedup, decontamination) yet would still land in the corpus, so
  * null-required rows MUST be quarantined, not passed through. Same
  * per-item isolation the NBA ingest applies to bad payloads (T4).
  *
  * Scale shape: the dump is scanned as TEXT and parsed in-plan with
  * `from_json`, so each channel is a streaming pass over the raw lines —
  * no cache of the parsed dump (the naive two-channel split via the
  * reader's corrupt-record column requires persisting the whole input,
  * which is exactly what a 100 TB read cannot do). The raw line rides
  * alongside the parse, which is what lets quarantine publish the
  * offending text verbatim. */
object Jsonl {

  private val Corrupt = "_graft_corrupt"

  /** Clean rows + quarantine. `schema` is the EXPECTED document schema;
    * columns in `requiredNonNull` (default: every schema column) send a
    * row to quarantine when null — a valid-JSON line missing its text is
    * as unusable as a malformed one, and more dangerous. */
  def read(spark: SparkSession, path: String, schema: StructType,
      requiredNonNull: Option[Seq[String]] = None): (DataFrame, DataFrame) = {
    // validate the contract BEFORE touching the filesystem: a bad schema
    // must fail as the config error it is, not as a path error
    validate(schema, requiredNonNull)
    // the quarantine's `_file` provenance must survive same-session
    // cache substitution: if this session has .cache()d a text read over
    // the SAME dump path, the cache manager substitutes the scan with
    // its InMemoryRelation — no file scan underneath — and
    // input_file_name() evaluates to "", blanking the audit column both
    // erasure call sites parse quarantined lines from (the deleteWhere
    // discovery failure mode, Warehouse r18; JsonlSpec's cached-dump
    // test reproduces the blank without this). Reading the EXPLICIT file
    // list gives the scan a FileIndex whose roots are the files, which a
    // cache over the directory never matches. Cost: one driver-side
    // recursive listing per ingest — a metadata pass Spark's own file
    // index performs anyway. Glob inputs expand first; a missing path
    // falls through to the plain read so Spark raises its standard
    // path-does-not-exist error (an EMPTY dir also falls through — it
    // has no rows to mis-attribute).
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .flatMap { st =>
        if (st.isDirectory) Warehouse.visibleDataFiles(fs, st.getPath)
        else Seq(st.getPath)
      }.map(_.toString)
    val lines =
      if (files.isEmpty) spark.read.textFile(path)
      else spark.read.textFile(files: _*)
    channels(lines.toDF("_line")
      .withColumn("_file", input_file_name()), schema, requiredNonNull)
  }

  /** The channel split behind [[read]], over an already-loaded frame of
    * raw lines — (`_line`: the raw text, `_file`: its source file). The
    * separate entry exists for STREAMING ingest: a crawl stream reads
    * lines with `readStream.text` and splits each micro-batch into
    * clean/quarantine inside `foreachBatch`, with the same parse, the
    * same quarantine rules, and the same no-cache two-pass shape as the
    * batch read — one definition, so the two paths cannot drift. */
  def channels(lines: DataFrame, schema: StructType,
      requiredNonNull: Option[Seq[String]] = None): (DataFrame, DataFrame) = {
    validate(schema, requiredNonNull)
    val required = requiredNonNull.getOrElse(schema.fieldNames.toSeq)
    // malformed lines surface through the corrupt column INSIDE the
    // parsed struct (from_json in PERMISSIVE mode), so parse state and
    // raw line coexist per row with no second read and no cache
    val parsed = lines.withColumn("_j", parse(col("_line"), schema))
    val broken = col("_j").isNull || col(s"_j.$Corrupt").isNotNull ||
      required.map(c => col(s"_j.$c").isNull).reduceOption(_ || _)
        .getOrElse(lit(false))
    val good = parsed.filter(!broken)
      .select(schema.fieldNames.map(c => col(s"_j.$c").as(c)).toSeq: _*)
    val quarantine = parsed.filter(broken)
      .select(col("_line").as("line"), col("_file").as("file"))
    (good, quarantine)
  }

  /** THE parse — one definition behind [[read]], [[channels]], and
    * [[lineIdIn]], so ingest and erasure can never disagree about what a
    * raw line says: `from_json` in PERMISSIVE mode against `schema`
    * widened with the internal corrupt-record column (malformed lines
    * surface through it INSIDE the struct, so parse state and raw line
    * coexist per row with no second read and no cache). */
  private def parse(lineCol: Column, schema: StructType): Column =
    from_json(lineCol, StructType(schema.fields :+
        StructField(Corrupt, StringType, nullable = true)),
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Corrupt))

  /** The one-field schema that addresses a JSONL line by its long id —
    * THE projection both erasure call sites parse quarantined lines
    * with ([[graft.corpus.CorpusMain.purgeCurated]] and
    * [[graft.corpus.GateState.purgeDocs]]): from_json field projection
    * is the same parse restricted to the named field, it is the
    * invariant part of any ingest schema (the stream gate's full schema
    * is corpus-derived at startup and not recorded anywhere a purge can
    * read), and parsing ONLY the id skips materializing source/text for
    * every line the predicate never looks at. One definition, so the
    * two purges cannot drift on how a line is addressed. */
  def idProjection(idCol: String): StructType =
    StructType(Seq(StructField(idCol, org.apache.spark.sql.types.LongType)))

  /** Null-safe ERASURE predicate over a column of raw JSONL lines: TRUE
    * iff the line parses (the same schema-locked PERMISSIVE [[parse]] as
    * the ingest channels — one definition, so the purge addresses lines
    * by exactly the id the pipeline would have read from them) to a row
    * whose `idCol` is one of `ids`. The subtlety this helper exists for:
    * quarantined lines include VALID JSON quarantined only for a null in
    * some OTHER required column — those carry a live id and the
    * document's verbatim text, so an erasure must reach them. A line
    * that is malformed, or whose id field itself is null/absent, has no
    * id to address and evaluates FALSE — never null, because this feeds
    * `deleteWhere`'s `filter(!predicate)` keep-side rewrite, where a
    * null would silently DELETE the unaddressable line it must keep.
    * Matching deliberately ignores the corrupt flag on OTHER fields: if
    * the id parses, the line is addressable, and erasure takes the
    * maximal reading. */
  def lineIdIn(lineCol: Column, schema: StructType, idCol: String,
      ids: Seq[Long]): Column = {
    validate(schema, None)
    require(schema.fieldNames.contains(idCol),
      s"lineIdIn: id column '$idCol' is not in the schema")
    require(ids.nonEmpty, "lineIdIn: need at least one id")
    coalesce(
      parse(lineCol, schema).getField(idCol)
        .isin(ids.distinct.map(Long.box): _*),
      lit(false))
  }

  private def validate(schema: StructType,
      requiredNonNull: Option[Seq[String]]): Unit = {
    require(!schema.fieldNames.contains(Corrupt),
      s"schema must not declare the internal '$Corrupt' column")
    val required = requiredNonNull.getOrElse(schema.fieldNames.toSeq)
    require(required.forall(schema.fieldNames.contains),
      s"requiredNonNull names unknown columns: " +
        required.filterNot(schema.fieldNames.contains).mkString(", "))
  }

  /** Write a frame as JSONL (one object per line, the exchange format
    * downstream tokenizer/trainer tooling consumes). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
