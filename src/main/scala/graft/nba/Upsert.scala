package graft.nba

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Idempotent keyed writes — the DataFrame emulation of the reference's
  * row-by-row `INSERT ... ON CONFLICT (id) DO UPDATE / DO NOTHING`
  * (reference: database/db_client.py:69-92; SURVEY.md §2.1 S6).
  *
  * Spark has no in-place upsert into parquet, so the merge is expressed as
  * set algebra over the key column and the caller rewrites the target
  * (or appends only `deltaNew` in delta mode — SURVEY.md §2.3 J2).
  * Both operations are one shuffle (or zero, if both sides are bucketed on
  * the key) and stream at any scale — unlike the reference's per-row SQL.
  */
object Upsert {

  /** ON CONFLICT DO UPDATE: incoming wins; existing rows keep rows whose
    * key is not being replaced. Incoming is deduped on the key first
    * (last-write-wins is meaningless in a set, so min-row-per-key via
    * dropDuplicates — the reference's executemany overwrites with the last
    * occurrence, a nondeterministic order we replace with a deterministic
    * dedup). */
  def replace(existing: DataFrame, incoming: DataFrame, key: String): DataFrame = {
    val in = incoming.dropDuplicates(key)
    existing.join(in.select(col(key)), Seq(key), "left_anti").unionByName(in)
  }

  /** ON CONFLICT DO NOTHING: existing wins. */
  def ignore(existing: DataFrame, incoming: DataFrame, key: String): DataFrame =
    existing.unionByName(
      incoming.dropDuplicates(key)
        .join(existing.select(col(key)), Seq(key), "left_anti"))

  /** Delta mode (reference: etl/play_by_play.py:50-62 and friends): the
    * incoming rows whose key is absent from the target — the only rows a
    * delta run needs to compute/fetch/append. */
  def deltaNew(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** A5 duplicate-key assertion as a checking query (reference:
    * utils/utils.py:1-10): offending keys with their multiplicities. */
  def duplicateKeys(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n")).filter(col("n") > 1)
}
