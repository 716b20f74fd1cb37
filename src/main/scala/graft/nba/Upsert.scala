package graft.nba

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

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

  /** Struct ordering is only defined for orderable types — MapType (at any
    * nesting depth) has no ordering and fails analysis inside min(struct). */
  private def isOrderable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case ArrayType(et, _) => isOrderable(et)
    case StructType(fields) => fields.forall(f => isOrderable(f.dataType))
    case _ => true
  }

  /** Deterministic min-row-per-key dedup: the winner is the minimum row
    * under the struct ordering of the non-key columns (field order = column
    * order), so the same input set always elects the same winner regardless
    * of partitioning or task order — unlike `dropDuplicates`, which keeps an
    * arbitrary partition-order-dependent first row. One map-side-combinable
    * aggregate, no window shuffle. Rows containing non-orderable columns
    * (maps) fall back to a window ordered by the row's JSON rendering —
    * still deterministic (equal JSON ⇒ equal row for the types we write),
    * at the cost of a window shuffle instead of a combinable aggregate. */
  private def minRowPerKey(df: DataFrame, key: String): DataFrame = {
    val others = df.columns.filterNot(_ == key)
    if (others.isEmpty) df.dropDuplicates(key) // key-only rows are all equal
    else if (others.forall(c => isOrderable(df.schema(c).dataType)))
      df.groupBy(col(key))
        .agg(min(struct(others.map(col): _*)).as("__row"))
        .select(col(key) +: others.map(c => col("__row").getField(c).as(c)): _*)
        .select(df.columns.map(col): _*)
    else {
      val w = Window.partitionBy(col(key))
        .orderBy(to_json(struct(others.map(col): _*)).asc_nulls_last)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }

  /** ON CONFLICT DO UPDATE: incoming wins; existing rows keep rows whose
    * key is not being replaced. Incoming is deduped on the key first via
    * deterministic min-row-per-key (the reference's executemany overwrites
    * with the last occurrence — an insertion-order accident we replace with
    * a total order). */
  def replace(existing: DataFrame, incoming: DataFrame, key: String): DataFrame = {
    val in = minRowPerKey(incoming, key)
    existing.join(in.select(col(key)), Seq(key), "left_anti").unionByName(in)
  }

  /** ON CONFLICT DO NOTHING: existing wins. */
  def ignore(existing: DataFrame, incoming: DataFrame, key: String): DataFrame =
    existing.unionByName(
      minRowPerKey(incoming, key)
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
