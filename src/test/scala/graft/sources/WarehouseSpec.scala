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

  test("a refresh failure in a maintenance finally must not mask the primary exception") {
    // injection: Catalog.refreshByPath cannot make a Path from an empty
    // string, so "" forces the refresh itself to throw. With a primary
    // exception in flight (the partial-erasure/compaction failure the
    // finally is protecting) the refresh failure must ride along as a
    // suppressed exception, never REPLACE it — Scala finally semantics
    // would otherwise swallow compact's "swap may still be in flight"
    // IOException (the r18 advisory)
    val primary = new java.io.IOException("the partial-erasure failure")
    Warehouse.refreshPathSuppressing(spark, "", primary)
    assert(primary.getSuppressed.nonEmpty,
      "the refresh failure must attach to the primary as suppressed")
    // without a primary the refresh failure itself propagates — the
    // caller must learn cached readers may still serve the retired rows
    intercept[Exception] { Warehouse.refreshPathSuppressing(spark, "", null) }
  }

  test("deleteWhere invalidates cached Datasets even when a file rewrite fails (partial erasure)") {
    val dir = s"${tmp()}/t"
    // two single-file writes -> two data files; file B carries the poison row
    Seq(("a1", 1), ("a2", 2)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Seq(("b1", 3), ("boom", 4)).toDF("k", "v").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    val fileB = new java.io.File(dir).listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .find(f => spark.read.parquet(f.getPath).filter($"k" === "boom").count() > 0)
      .get
    // the injected failure fires only inside file B's REWRITE: the hidden
    // `.del-<name>` staging sibling exists only while deleteWhere is
    // rewriting that exact file, so the initial affected-files scan passes
    // (B is affected via b1) and file A's rewrite lands regardless of pool
    // scheduling — a deterministic PARTIAL erasure
    val stagingB = s"${fileB.getParent}/.del-${fileB.getName}"
    val poison = udf((k: String) => {
      if (k == "boom" &&
          java.nio.file.Files.exists(java.nio.file.Paths.get(stagingB)))
        throw new RuntimeException("injected rewrite failure")
      k == "a1" || k == "b1"
    })
    val cached = spark.read.parquet(dir).cache()
    assert(cached.count() == 4) // materialize over the pre-erasure files
    intercept[Exception] {
      Warehouse.deleteWhere(spark, dir, poison($"k"), maxConcurrentFiles = 2)
    }
    // the erasure partially applied: a1 is gone from disk, file B intact
    val onDisk = spark.read.parquet(dir).select("k").as[String].collect().toSet
    assert(onDisk == Set("a2", "b1", "boom"), s"injection shape changed: $onDisk")
    // ...and the propagated failure must leave the cache invalidated: a
    // caller that catches and continues in-session must NOT be served the
    // row the partial erasure already removed (for a GDPR delete, the
    // worst staleness) — refreshPath runs in deleteWhere's finally
    try assert(cached.select("k").as[String].collect().toSet == onDisk,
      "cached reader served an already-erased row after a failed deleteWhere")
    finally cached.unpersist()
  }

  test("deleteWhere erases correctly when the session has the table cached (real file provenance)") {
    val dir = s"${tmp()}/t"
    Seq(("a1", 1), ("a2", 2)).toDF("k", "v").coalesce(1).write.parquet(dir)
    Seq(("b1", 3), ("b2", 4)).toDF("k", "v").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    // cache substitution would hand deleteWhere's affected-files scan the
    // InMemoryRelation, where input_file_name() is "" (no file scan
    // underneath) — the discovery must read the explicit file list so an
    // in-session cache cannot blind the erasure to file provenance
    val cached = spark.read.parquet(dir).cache()
    assert(cached.count() == 4)
    val (files, rows) = Warehouse.deleteWhere(spark, dir, $"k" === "a1")
    assert(files == 1 && rows == 1)
    try assert(cached.select("k").as[String].collect().toSet == Set("a2", "b1", "b2"))
    finally cached.unpersist()
  }

  test("compact invalidates cached Datasets even when a leaf rewrite fails (partial compaction)") {
    val dir = s"${tmp()}/t"
    // leaf-by-leaf layout: leaf a's files carry a column leaf b's lack, so
    // clusterCols=Seq("extra") compacts leaf a cleanly and fails analysis
    // on leaf b — a deterministic partial compaction, independent of pool
    // scheduling (the drain waits for every leaf either way)
    Seq((1, "x"), (2, "y")).toDF("id", "extra").coalesce(1).write.parquet(s"$dir/p=a")
    Seq((5, "z")).toDF("id", "extra").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(s"$dir/p=a")
    Seq(3).toDF("id").coalesce(1).write.parquet(s"$dir/p=b")
    Seq(4).toDF("id").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(s"$dir/p=b")
    // cache WITHOUT materializing: the entry's file listing snapshots the
    // four pre-compaction data files
    val cached = spark.read.parquet(dir).cache()
    intercept[Exception] {
      Warehouse.compact(spark, dir, clusterCols = Seq("extra"))
    }
    // leaf a WAS compacted (its two originals replaced by one new file):
    // materializing the cache from the stale listing would throw
    // FileNotFound — compact's finally-refresh relists, so the cached
    // reader just sees the table despite the propagated failure
    try assert(cached.count() == 5,
      "cached reader failed after a partially-failed compact — cache not refreshed")
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
