package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Physical-layout operators: clustered (sorted) writes actually produce
  * disjoint per-file key ranges and actually cut the rows a selective scan
  * reads; compaction collapses fragmented leaves without changing data,
  * schema, or partition layout.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_layout").toString

  /** Rows with ids deliberately shuffled so an unsorted write spreads every
    * key range across every file. */
  private def shuffled(n: Int) =
    spark.range(n.toLong)
      .select(col("id"), md5(col("id").cast("string")).as("payload"))
      .orderBy(col("payload")) // decorrelate storage order from id order

  /** Total records read from storage while running `f` — row-group pruning
    * shows up here: skipped groups are never materialized as records. */
  private def recordsRead(f: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          acc.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      // the listener bus is async: wait until the count stops moving
      // (bounded), not a fixed beat a loaded box can outlast
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var prev = -1L
      while (prev != acc.get() && System.nanoTime() < deadline) {
        prev = acc.get()
        Thread.sleep(200)
      }
    } finally spark.sparkContext.removeSparkListener(l)
    acc.get()
  }

  test("clustered: per-file id ranges are disjoint and files sorted within") {
    val dir = s"${tmp()}/t"
    Warehouse.writeClustered(shuffled(20000), dir, Seq("id"), numFiles = 8)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length == 8, s"expected 8 files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((fa, _, hiA), (fb, loB, _)) =>
        assert(hiA < loB, s"overlapping ranges between $fa and $fb")
      case _ =>
    }
    assert(spark.read.parquet(dir).count() == 20000)
  }

  test("clustered scan reads a fraction of the records an unsorted scan does") {
    val root = tmp()
    val df = shuffled(200000)
    df.repartition(8).write.parquet(s"$root/unsorted")
    Warehouse.writeClustered(df, s"$root/clustered", Seq("id"), numFiles = 8)
    def hits(dir: String): Long = {
      var matches = 0L
      val read = recordsRead {
        matches = spark.read.parquet(dir)
          .filter(col("id").between(100000, 100999)).count()
      }
      assert(matches == 1000, s"$dir: wrong filter result")
      read
    }
    val unsorted = hits(s"$root/unsorted")
    val sorted = hits(s"$root/clustered")
    // every unsorted file's min/max straddles the range -> all groups read;
    // the clustered table satisfies it from one file's groups
    assert(unsorted >= 200000 / 2, s"unsorted read only $unsorted — probe broken?")
    assert(sorted * 4 <= unsorted,
      s"clustered layout did not prune: read $sorted vs unsorted $unsorted")
  }

  test("clustered composes with replaceDir: crash-safe publish of a sorted table") {
    val dir = s"${tmp()}/t"
    Warehouse.replaceDir(Warehouse.clustered(shuffled(5000), Seq("id"), 4), dir)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name()).agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach {
      case Array((_, _, hiA), (_, loB, _)) => assert(hiA < loB)
      case _ =>
    }
  }

  test("zorder: a filter on EITHER key prunes; single-key clustering serves only its own") {
    val root = tmp()
    // 256x256 grid, row order decorrelated from both keys
    val grid = spark.range(256L * 256L)
      .select((col("id") % 256).as("x"), expr("id div 256").as("y"),
        md5(col("id").cast("string")).as("payload"))
      .orderBy(col("payload"))
    Warehouse.writeClustered(grid, s"$root/by_x", Seq("x"), numFiles = 16)
    // bits=8: the 256-value keys bin densely (bin == key), so the 16
    // equal-population z-ranges are exactly the 16 64x64 tiles — provided
    // the range sampler sees enough rows to place boundaries on the tile
    // edges (default 100 samples/partition leaves files straddling tiles;
    // a production layout job raises it the same way)
    val sampleKey = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prevSample = spark.conf.getOption(sampleKey)
    spark.conf.set(sampleKey, "8192")
    try Warehouse.writeZordered(grid, s"$root/zorder", Seq("x", "y"),
      numFiles = 16, bits = Some(8))
    finally prevSample.fold(spark.conf.unset(sampleKey))(spark.conf.set(sampleKey, _))
    def readFor(dir: String, k: String): Long = {
      var matches = 0L
      val read = recordsRead {
        matches = spark.read.parquet(s"$root/$dir")
          .filter(col(k).between(100, 115)).count()
      }
      assert(matches == 16L * 256L, s"$dir/$k: wrong filter result")
      read
    }
    val zy = readFor("zorder", "y")
    val xy = readFor("by_x", "y")
    // x-clustered files are vertical stripes: every one straddles any y
    // band, so nothing prunes; z-order tiles let the band skip most files
    assert(xy >= 256L * 256L / 2, s"by_x read only $xy for a y filter — probe broken?")
    assert(zy * 2 <= xy, s"zorder did not prune on y: read $zy vs $xy")
    // the trade: on its own key, perfect single-key clustering reads less
    // than z-order's square tiles
    val zx = readFor("zorder", "x")
    val xx = readFor("by_x", "x")
    assert(xx <= zx, s"single-key clustering lost its own key: $xx vs $zx")
    assert(zx * 2 <= 256L * 256L, s"zorder did not prune on x either: $zx")
  }

  test("zorder: nulls and constant keys degrade gracefully, data intact") {
    val df = spark.range(1000)
      .select(col("id").as("x"),
        when(col("id") % 10 === 0, lit(null)).otherwise(col("id")).as("y"),
        lit(7).as("c"))
    val out = Warehouse.zordered(df, Seq("x", "y", "c"), numFiles = 4, bits = Some(8))
    assert(out.count() == 1000)
    assert(out.columns.toSeq == Seq("x", "y", "c"), "no helper column leaks")
    intercept[IllegalArgumentException] {
      Warehouse.zordered(df, Seq("x"), 4) // one key -> use clustered()
    }
    intercept[IllegalArgumentException] {
      Warehouse.zordered(df.withColumn("s", lit("a")), Seq("x", "s"), 4)
    }
  }

  test("zorder: default bits auto-sizes to the 63-bit budget; explicit overflow throws") {
    val df = spark.range(1000).select(col("id").as("a"), (col("id") * 2).as("b"),
      (col("id") % 7).as("c"), (col("id") % 11).as("d"))
    // 4 keys at the old fixed 16 bits/key would need 64 bits (the sign
    // bit); the auto default drops to 15/key and just works
    assert(Warehouse.zordered(df, Seq("a", "b", "c", "d"), 4).count() == 1000)
    intercept[IllegalArgumentException] {
      Warehouse.zordered(df, Seq("a", "b", "c", "d"), 4, bits = Some(16))
    }
    // an explicit 0 is a caller bug, not a request to auto-size: the old
    // in-band `bits = 0` sentinel silently auto-sized it
    intercept[IllegalArgumentException] {
      Warehouse.zordered(df, Seq("a", "b"), 4, bits = Some(0))
    }
  }

  test("compact: collapses a fragmented flat table, content and schema intact") {
    val dir = s"${tmp()}/t"
    val df = spark.range(10000).select(col("id"), (col("id") % 7).as("v"))
    df.repartition(32).write.parquet(dir)
    def files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    assert(files.length == 32)
    val before = spark.read.parquet(dir)
    val schemaBefore = before.schema
    val sumBefore = before.agg(sum(col("id")), sum(col("v"))).first()
    assert(Warehouse.compact(spark, dir) == 1, "one leaf rewritten")
    assert(files.length < 32, s"still ${files.length} files")
    val after = spark.read.parquet(dir)
    assert(after.schema == schemaBefore)
    assert(after.agg(sum(col("id")), sum(col("v"))).first() == sumBefore)
    assert(after.count() == 10000)
    // already-compact leaves are left untouched: idempotent, zero rewrites
    assert(Warehouse.compact(spark, dir) == 0)
  }

  test("compact: partitioned table is compacted per leaf, layout preserved") {
    val dir = s"${tmp()}/t"
    spark.range(6000)
      .select(col("id"), (col("id") % 3).cast("string").as("p"))
      .repartition(8) // 8 files in each of the 3 partition leaves
      .write.partitionBy("p").parquet(dir)
    def leafFiles(p: String) = new java.io.File(s"$dir/p=$p").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    assert(leafFiles("0").length == 8)
    assert(Warehouse.compact(spark, dir) == 3, "all three leaves rewritten")
    Seq("0", "1", "2").foreach(p =>
      assert(leafFiles(p).length == 1, s"leaf p=$p not compacted"))
    val after = spark.read.parquet(dir)
    assert(after.count() == 6000)
    assert(after.groupBy(col("p")).count().as[(String, Long)].collect().toMap
      == Map("0" -> 2000L, "1" -> 2000L, "2" -> 2000L))
    // partition column still derived from the directory layout
    assert(after.filter(col("p") === "1").count() == 2000)
  }

  test("compact(clusterCols) preserves disjoint key ranges; plain compact doesn't") {
    val root = tmp()
    def fragmented(dir: String): Unit = {
      // 8 clustered files, then fragment the SAME data into 32 small files
      val df = shuffled(20000)
      df.repartition(32).write.parquet(dir)
    }
    def ranges(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name()).agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    fragmented(s"$root/plain")
    fragmented(s"$root/reclustered")
    assert(Warehouse.compact(spark, s"$root/plain") == 1)
    assert(Warehouse.compact(spark, s"$root/reclustered",
      targetFileBytes = 64 * 1024, clusterCols = Seq("id")) == 1)
    // re-clustered leaves: multiple files, disjoint sorted ranges
    val rc = ranges(s"$root/reclustered")
    assert(rc.length > 1, "target size should yield several files")
    rc.sliding(2).foreach {
      case Array((_, _, hiA), (_, loB, _)) =>
        assert(hiA < loB, "re-clustered compaction lost range disjointness")
      case _ =>
    }
    assert(spark.read.parquet(s"$root/reclustered").count() == 20000)
  }

  test("compact runs leaf rewrites concurrently (listener-observed overlap)") {
    val dir = s"${tmp()}/t"
    spark.range(60000)
      .select(col("id"), (col("id") % 6).cast("string").as("p"))
      .repartition(16) // 16 files in each of the 6 leaves
      .write.partitionBy("p").parquet(dir)
    // track, per job, which compact leaf submitted it (compact tags each
    // submitter thread via the graft.compact.leaf local property); the
    // listener bus delivers start/end in submission order, so observing
    // two DISTINCT leaves active at once proves the rewrites overlapped
    val lock = new Object
    val active = scala.collection.mutable.Map.empty[Int, String]
    @volatile var maxDistinctActive = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        Option(js.properties).flatMap(p => Option(p.getProperty("graft.compact.leaf")))
          .foreach { leaf => lock.synchronized {
            active(js.jobId) = leaf
            maxDistinctActive = math.max(maxDistinctActive, active.values.toSet.size)
          }}
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        lock.synchronized { active.remove(je.jobId); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(Warehouse.compact(spark, dir) == 6)
      // listener delivery is async: give the bus a moment to drain
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (maxDistinctActive < 2 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(maxDistinctActive >= 2,
        s"leaf rewrites never overlapped (max distinct active = $maxDistinctActive)")
    } finally spark.sparkContext.removeSparkListener(listener)
    val after = spark.read.parquet(dir)
    assert(after.count() == 60000)
    assert(after.select(countDistinct(col("p"))).first().getLong(0) == 6)
  }

  test("compact: a failing leaf doesn't stop the others; first failure rethrown") {
    val dir = s"${tmp()}/t"
    spark.range(3000)
      .select(col("id"), (col("id") % 3).cast("string").as("p"))
      .repartition(8)
      .write.partitionBy("p").parquet(dir)
    // poison ONE leaf: a file with the parquet extension but garbage bytes
    // makes that leaf's read job fail while the siblings stay valid
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/p=1/part-junk.parquet"),
      "not a parquet file".getBytes("UTF-8"))
    def leafFiles(p: String) = new java.io.File(s"$dir/p=$p").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    intercept[Throwable] { Warehouse.compact(spark, dir) }
    // the healthy leaves were still rewritten (drain-then-rethrow), and
    // the poisoned leaf kept its original files (its swap never ran)
    assert(leafFiles("0").length == 1, "healthy leaf p=0 not compacted")
    assert(leafFiles("2").length == 1, "healthy leaf p=2 not compacted")
    assert(leafFiles("1").length == 9, "failed leaf must be left as-is")
    assert(spark.read.parquet(s"$dir/p=0").count() == 1000)
  }

  test("compact heals an interrupted swap before rewriting (recover-first)") {
    val root = tmp()
    val dir = s"$root/t"
    spark.range(100).toDF("id").repartition(4).write.parquet(dir)
    // simulate a crash that left the table stranded in the .old sibling
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir), java.nio.file.Paths.get(s"$root/.t.old"))
    assert(Warehouse.compact(spark, dir) == 1)
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("deleteWhere rewrites ONLY the files holding matches; clean files untouched") {
    val dir = tmp()
    // clustered on id: 4 files with disjoint id ranges — one user's rows
    // live in exactly one file, the layout the op is designed for
    Warehouse.writeClustered(
      shuffled(400).withColumn("user_id", col("id") % 100), dir,
      Seq("user_id"), numFiles = 4)
    def files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".")
        && !f.getName.startsWith("_"))
      .map(f => f.getName -> f.lastModified()).toMap
    val before = files
    val (nFiles, nRows) = Warehouse.deleteWhere(spark, dir, col("user_id") === 7)
    assert(nFiles == 1 && nRows == 4, s"($nFiles, $nRows)")
    val after = files
    assert(spark.read.parquet(dir).filter(col("user_id") === 7).count() == 0)
    assert(spark.read.parquet(dir).count() == 396)
    // the replacement keeps the original NAME (readers' file lists stay
    // stable) — so "untouched" shows up as unchanged mtimes, exactly 3
    assert(after.keySet == before.keySet, "file names must be stable")
    val rewritten = before.keys.filter(n => before(n) != after(n)).toSet
    assert(rewritten.size == 1, s"exactly one file replaced: $rewritten")
    // no swap debris, and a rerun is an exact no-op
    assert(new java.io.File(dir).listFiles()
      .forall(f => !f.getName.endsWith(".old") && !f.getName.startsWith(".del-")))
    assert(Warehouse.deleteWhere(spark, dir, col("user_id") === 7) == ((0, 0L)))
  }

  test("deleteWhere: partition-column predicates prune and empty a leaf; files vanish") {
    val dir = tmp()
    spark.range(100).toDF("id")
      .withColumn("p", when(col("id") % 2 === 0, "a").otherwise("b"))
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val (_, nRows) = Warehouse.deleteWhere(spark, dir, col("p") === "b")
    assert(nRows == 50L)
    assert(spark.read.parquet(dir).count() == 50)
    assert(spark.read.parquet(dir).filter(col("p") === "b").count() == 0)
    // the emptied leaf holds no visible data files
    val leaf = new java.io.File(s"$dir/p=b")
    assert(!leaf.exists() || leaf.listFiles().forall(f =>
      f.getName.startsWith(".") || f.getName.startsWith("_")),
      "a fully-matching leaf's files must disappear")
    // mixed predicate: rows in the surviving partition still delete fine
    val (_, n2) = Warehouse.deleteWhere(spark, dir,
      col("p") === "a" && col("id") < 10)
    assert(n2 == 5L && spark.read.parquet(dir).count() == 45)
  }

  test("deleteWhere on a dir a previous delete emptied is a (0,0) no-op, not a schema crash") {
    val dir = tmp()
    spark.range(10).toDF("id").coalesce(1).write.mode("overwrite").parquet(dir)
    val (_, n1) = Warehouse.deleteWhere(spark, dir, col("id") >= 0)
    assert(n1 == 10L, "everything matches: the lone file drops")
    // only _SUCCESS (and hidden files) remain — a rerun of the same
    // erasure (purgeDocs idempotence) must see nothing to do, not die
    // inferring a schema from zero data files
    assert(Warehouse.deleteWhere(spark, dir, col("id") >= 0) == ((0, 0L)))
  }

  test("deleteWhere on a dir that was never published is a (0,0) no-op, not a FileNotFoundException") {
    // nothing published (or everything retired) means nothing to erase —
    // the r14 advisory: the visible-data gate's recursive listing throws
    // raw on a missing dir, so deleteWhere must exists-gate first
    val dir = new java.io.File(tmp(), "never_published").getPath
    assert(Warehouse.deleteWhere(spark, dir, col("id") >= 0) == ((0, 0L)))
  }

  test("deleteWhere heals a whole-dir interrupted swap before gating (recover-first, r15 advisory)") {
    val root = tmp()
    val dir = s"$root/t"
    spark.range(100).toDF("id").coalesce(1).write.parquet(dir)
    // simulate a crash between swap's retire and publish: the ENTIRE
    // table sits in the hidden .t.old sibling, the target dir is absent.
    // An exists-gate running before recover() would report (0, 0) —
    // "nothing to delete" — and the next recover() would resurrect the
    // rows this erasure claimed to remove (GateState.purgeDocs routes
    // actual erasures through deleteWhere, so this is an erasure bug)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir), java.nio.file.Paths.get(s"$root/.t.old"))
    val (nf, nr) = Warehouse.deleteWhere(spark, dir, col("id") === 5)
    assert(nf == 1 && nr == 1, s"heal must restore the table first: ($nf, $nr)")
    assert(spark.read.parquet(dir).count() == 99)
    assert(spark.read.parquet(dir).filter(col("id") === 5).count() == 0,
      "the matching row must actually be gone after the heal")
    assert(!new java.io.File(s"$root/.t.old").exists(),
      "the .old sibling must be consumed by the heal, not left to resurrect")
  }

  test("deleteWhere heals a stranded file-level .old before running (recover-first)") {
    val dir = tmp()
    spark.range(100).toDF("id").coalesce(1).write.mode("overwrite").parquet(dir)
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    // simulate a crash between retire and publish: the data file sits
    // aside as .name.old, the table view is missing it
    java.nio.file.Files.move(part.toPath,
      part.toPath.resolveSibling(s".${part.getName}.old"))
    val (nf, nr) = Warehouse.deleteWhere(spark, dir, col("id") === 5)
    assert(nf == 1 && nr == 1, s"heal must restore the file first: ($nf, $nr)")
    assert(spark.read.parquet(dir).count() == 99)
  }
}
