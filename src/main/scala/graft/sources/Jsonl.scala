package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines source/sink for document corpora — the wire format crawl
  * dumps actually arrive in. Reads are SCHEMA-LOCKED (inference over a
  * 100 TB dump would be a full extra pass, and a schema drift would merge
  * silently) and carry a QUARANTINE channel: a malformed line becomes a
  * (line, file) row instead of killing the job or silently vanishing —
  * the same per-item failure isolation the NBA ingest applies to bad
  * payloads (T4; reference quarantines per-game failures the same way,
  * see nba/Lineups).
  *
  * Scale shape: one pass over the input. Spark refuses to filter on the
  * corrupt-record column of an un-materialized JSON scan (the parser
  * would have to run twice and could disagree with itself), so the parsed
  * frame is persisted once and both channels — clean rows and quarantine
  * — split from those cached blocks. The caller unpersists via the
  * returned handle after publishing both sides. */
object Jsonl {

  private val Corrupt = "_graft_corrupt"

  /** Clean rows + quarantine + a release handle for the shared one-pass
    * cache. `schema` is the EXPECTED document schema (no corrupt column —
    * it is managed here). */
  def read(spark: SparkSession, path: String, schema: StructType):
      (DataFrame, DataFrame, () => Unit) = {
    require(!schema.fieldNames.contains(Corrupt),
      s"schema must not declare the internal '$Corrupt' column")
    val parsed = spark.read
      .schema(StructType(schema.fields :+
        StructField(Corrupt, StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)
      .withColumn("_file", input_file_name())
      .persist()
    val good = parsed.filter(col(Corrupt).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantine = parsed.filter(col(Corrupt).isNotNull)
      .select(col(Corrupt).as("line"), col("_file").as("file"))
    (good, quarantine, () => { parsed.unpersist(); () })
  }

  /** Write a frame as JSONL (one object per line, the exchange format
    * downstream tokenizer/trainer tooling consumes). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
