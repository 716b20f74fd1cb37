package graft.sources

import org.apache.hadoop.fs.Path
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

  /** Replace the whole directory-table `dir` with `df` via
    * write-audit-publish: stage to a hidden sibling directory, then swap by
    * rename. The staged write may freely READ the current `dir` (an upsert
    * merge does) — the target is only touched after the stage commits, so
    * there is never a self-overwrite read and a failed run leaves the
    * published table intact. The swap itself renames the old table ASIDE
    * (never deletes it first), so a crash mid-publish strands at most a
    * hidden `.old` sibling, not the table: `recoverDir` (called on entry)
    * rolls an interrupted swap forward or back on the next run. Renames are
    * per-directory metadata ops, so publish is O(1) regardless of size. */
  def replaceDir(df: DataFrame, dir: String): Unit = {
    val target = new Path(dir)
    val fs = target.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    recoverDir(fs, target)
    val staging = stagingFor(target)
    fs.delete(staging, true)
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    swap(fs, staging, target)
  }

  /** Publish `staging` as `target` without a window in which neither
    * exists: old target → hidden `.old` sibling, staging → target, then
    * drop the `.old`. On a failed final rename the old table is restored. */
  private def swap(fs: org.apache.hadoop.fs.FileSystem, staging: Path, target: Path): Unit = {
    val old = oldFor(target)
    fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"failed to retire $target -> $old")
    if (!fs.rename(staging, target)) {
      if (fs.exists(old)) fs.rename(old, target) // roll back
      throw new java.io.IOException(s"failed to publish $staging -> $target")
    }
    fs.delete(old, true)
  }

  /** Heal an interrupted swap: if a crash left the `.old` sibling holding
    * the table (target missing), rename it back; otherwise drop leftovers. */
  private def recoverDir(fs: org.apache.hadoop.fs.FileSystem, target: Path): Unit = {
    val old = oldFor(target)
    if (fs.exists(old)) {
      if (!fs.exists(target)) fs.rename(old, target)
      else fs.delete(old, true)
    }
  }

  /** Heal ALL interrupted swaps under table `dir` — the root and every
    * partition directory. A crash between retire and publish leaves data
    * only in a dot-hidden `.name.old` sibling, INVISIBLE to parquet
    * readers: any read-modify-write that runs before recovery would merge
    * against a table silently missing that partition and then permanently
    * overwrite it. Therefore this must run BEFORE the target is read, not
    * merely before it is written — Publish.idempotent and the entry points
    * call it first thing; it is idempotent and costs one listing walk. */
  def recover(spark: SparkSession, dir: String): Unit = {
    val target = new Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverDir(fs, target)
    def walk(p: Path): Unit =
      if (fs.exists(p) && fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).foreach { st =>
          val n = st.getPath.getName
          if (st.isDirectory) {
            if (n.startsWith(".") && n.endsWith(".old")) {
              val orig = new Path(p, n.drop(1).dropRight(4))
              if (!fs.exists(orig)) fs.rename(st.getPath, orig)
              else fs.delete(st.getPath, true)
            } else if (!n.startsWith(".") && !n.startsWith("_")) walk(st.getPath)
          }
        }
    walk(target)
  }

  /** Dynamic partition overwrite via write-audit-publish: stage `df`
    * partitioned, then swap exactly the partition directories present in
    * the stage — partitions absent from `df` are untouched. Same guarantees
    * as replaceDir (stage may read the target; publish is one rename per
    * affected partition). This is the idempotent write a non-delta pipeline
    * rerun needs: recomputing a season replaces that season's partitions
    * instead of appending duplicates. */
  def overwritePartitions(df: DataFrame, dir: String,
      partitionCols: Seq[String] = PartitionCols): Unit = {
    val target = new Path(dir)
    val fs = target.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    // heal interrupted swaps FIRST: `df` may read the target (a merge
    // does), and that read must see partitions stranded in .old siblings
    recover(df.sparkSession, dir)
    val staging = stagingFor(target)
    fs.delete(staging, true)
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(staging.toString)
    def leaves(p: Path, depth: Int): Seq[Path] =
      if (depth == 0) Seq(p)
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .flatMap(st => leaves(st.getPath, depth - 1))
    // compare decoded URI paths: listStatus returns scheme-qualified Paths
    // while `staging` may be scheme-less, so raw toString prefixes differ
    val stagingUriPath = fs.makeQualified(staging).toUri.getPath
    leaves(staging, partitionCols.length).foreach { leaf =>
      val rel = leaf.toUri.getPath.stripPrefix(stagingUriPath).stripPrefix("/")
      require(rel.nonEmpty && !rel.startsWith("/"), s"bad partition leaf $leaf")
      val dst = new Path(target, rel)
      fs.mkdirs(dst.getParent)
      recoverDir(fs, dst)
      swap(fs, leaf, dst) // per-partition rename-aside: no delete-then-rename window
    }
    fs.delete(staging, true)
  }

  private def stagingFor(target: Path): Path =
    new Path(target.getParent, s".${target.getName}.staging")

  /** Hidden (dot-prefixed, so invisible to parquet readers) sibling holding
    * the retired version of `target` during a swap. */
  private def oldFor(target: Path): Path =
    new Path(target.getParent, s".${target.getName}.old")

  /** S8 database bootstrap (reference: database/db_init.py:7-20,
    * create_database_if_not_exists): the catalog analog — idempotent
    * CREATE DATABASE, optionally pinned to a warehouse root directory so
    * catalog tables (writeBucketed) land under a governed location.
    * Returns true iff this call created the database. */
  def createDatabase(spark: SparkSession, name: String,
      location: Option[String] = None): Boolean = {
    val existed = spark.catalog.databaseExists(name)
    if (!existed) {
      val loc = location.map(l => s" LOCATION '$l'").getOrElse("")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$name`$loc")
    }
    !existed
  }

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
