package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-design analog of the reference's Postgres DDL hardening
  * (reference: database/db_client.py:94-150; SURVEY.md §2.1 S5/S7/S9).
  *
  * The reference creates B-tree indexes on GAME_ID/SEASON/SEASON_TYPE; the
  * warehouse equivalent is `partitionBy(SEASON, SEASON_TYPE)` on write —
  * partition pruning turns the reference's indexed point queries into
  * directory pruning, and per-season directories bound task input size at
  * any corpus scale. GAME_ID stays unpartitioned (1.2k+ games/season would
  * explode the file count); per-game access rides the SEASON prune + row
  * group filter.
  */
object Warehouse {

  val PartitionCols: Seq[String] = Seq("SEASON", "SEASON_TYPE")

  def writeTable(df: DataFrame, dir: String, mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode).partitionBy(PartitionCols: _*).parquet(dir)

  def readTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** S9 CSV sink for golden-file parity (reference: test.py:15). */
  def writeCsv(df: DataFrame, dir: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(dir)

  /** Bucketed catalog table: pre-shuffled layout on the join key, so two
    * tables bucketed the same way join with NO exchange — the co-located
    * join a 100 TB star schema needs for its fact-fact joins (pbp ⋈
    * rotations ⋈ lineups on GAME_ID). Bucket count is a layout contract:
    * both sides must match.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
