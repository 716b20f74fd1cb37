package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Write-audit-publish semantics of the directory warehouse: the staged
  * write may read the target, a crash mid-swap never loses the table, and
  * partition overwrite touches only the partitions present in the stage. */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_wh").toString
  private def readIds(dir: String) =
    spark.read.parquet(dir).select("id").as[Int].collect().toSet

  test("replaceDir: the staged write may read the current target (self-merge)") {
    val dir = s"${tmp()}/t"
    Warehouse.replaceDir(Seq(1, 2).toDF("id"), dir)
    // merge = existing ∪ incoming, reading the target being replaced
    val merged = spark.read.parquet(dir).unionByName(Seq(3).toDF("id"))
    Warehouse.replaceDir(merged, dir)
    assert(readIds(dir) == Set(1, 2, 3))
  }

  test("replaceDir heals a crash window where the table sits in the .old sibling") {
    val root = tmp()
    val dir = s"$root/t"
    Warehouse.replaceDir(Seq(1).toDF("id"), dir)
    // simulate a crash between retire (target -> .old) and publish:
    // the table exists only as the hidden .old sibling
    Files.move(Paths.get(dir), Paths.get(s"$root/.t.old"))
    assert(!Files.exists(Paths.get(dir)))
    // next run recovers the old table on entry, so a reading stage works,
    // then publishes the new data and drops the .old
    Warehouse.replaceDir(Seq(2).toDF("id"), dir)
    assert(readIds(dir) == Set(2))
    assert(!Files.exists(Paths.get(s"$root/.t.old")), ".old must be cleaned up")
  }

  test("replaceDir drops a stale .old when the target survived the crash") {
    val root = tmp()
    val dir = s"$root/t"
    Warehouse.replaceDir(Seq(1).toDF("id"), dir)
    Files.createDirectory(Paths.get(s"$root/.t.old")) // crash after publish
    Warehouse.replaceDir(Seq(2).toDF("id"), dir)
    assert(readIds(dir) == Set(2))
    assert(!Files.exists(Paths.get(s"$root/.t.old")))
  }

  test("publish refreshes cached Datasets over the table (coherence across swaps)") {
    val dir = s"${tmp()}/t"
    Warehouse.replaceDir(Seq(1, 2).toDF("id"), dir)
    val cached = spark.read.parquet(dir).cache()
    assert(cached.count() == 2) // materialize the cache over the OLD files
    // a filesystem-level swap happens behind DataFrameWriter's back (it
    // refreshed the hidden staging path it wrote, not the live table):
    // without the publish-side refreshByPath, this cached Dataset keeps
    // serving the retired snapshot's rows for the rest of the session
    Warehouse.replaceDir(Seq(3, 4, 5).toDF("id"), dir)
    try assert(cached.count() == 3,
      "a cached reader must see the published table, not the retired snapshot")
    finally cached.unpersist()
  }

  test("overwritePartitions swaps exactly the staged partitions, leaves others intact") {
    val dir = s"${tmp()}/t"
    val v1 = Seq((1, "2023-24", "Regular Season"), (2, "2024-25", "Regular Season"))
      .toDF("id", "SEASON", "SEASON_TYPE")
    Warehouse.writeTable(v1, dir, org.apache.spark.sql.SaveMode.Overwrite)
    // recompute only 2024-25: its partition is replaced, 2023-24 untouched
    val v2 = Seq((3, "2024-25", "Regular Season")).toDF("id", "SEASON", "SEASON_TYPE")
    Warehouse.overwritePartitions(v2, dir)
    assert(readIds(dir) == Set(1, 3))
    // rerun with identical input is idempotent
    Warehouse.overwritePartitions(v2, dir)
    assert(readIds(dir) == Set(1, 3))
    // no visible swap debris: only partition dirs and _SUCCESS-style files
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(n => n.startsWith(".") && n.endsWith(".old"))
    assert(leftovers.isEmpty, s"swap debris: ${leftovers.mkString(",")}")
  }

  test("snapshotDiff classifies added/removed/changed; reorder and unchanged are silent") {
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "s", "v")
    // 1 unchanged, 2 changed (payload), 3 removed, 4 added
    val nu = Seq((1L, "a", 1.0), (2L, "B", 2.0), (4L, "d", 4.0))
      .toDF("id", "s", "v")
    val got = Warehouse.snapshotDiff(old, nu, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "changed"), (3L, "removed"), (4L, "added")))
    // includeUnchanged is the debugging view
    val full = Warehouse.snapshotDiff(old, nu, Seq("id"), includeUnchanged = true)
      .as[(Long, String)].collect().toMap
    assert(full(1L) == "unchanged" && full.size == 4)
    // a column-REORDERED but equal snapshot must not diff
    val reordered = nu.select("v", "id", "s")
    assert(Warehouse.snapshotDiff(nu, reordered, Seq("id")).count() == 0)
    // null vs zero IS a change (to_json drops null fields)
    val oldN = Seq((1L, Option.empty[Double])).toDF("id", "v")
    val nuN = Seq((1L, Option(0.0))).toDF("id", "v")
    assert(Warehouse.snapshotDiff(oldN, nuN, Seq("id"))
      .as[(Long, String)].collect().toSeq == Seq((1L, "changed")))
    // key-only table: presence is the row — only add/remove can happen
    val ko = Warehouse.snapshotDiff(
      Seq(1L, 2L).toDF("id"), Seq(2L, 3L).toDF("id"), Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(ko == Set((1L, "removed"), (3L, "added")))
    intercept[IllegalArgumentException] {
      Warehouse.snapshotDiff(old, old.drop("v"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Warehouse.snapshotDiff(old, nu, Seq.empty)
    }
  }
}
