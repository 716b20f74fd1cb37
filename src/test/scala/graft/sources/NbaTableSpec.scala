package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The DataSourceV2 REST table: `spark.read.format("nba")` over a fake
  * transport — partition-level fan-out parallelism and column pruning must
  * both be visible in the physical plan. */
class NbaTableSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (1 to 20).map(i => f"00224000$i%02d")

  private def reader = spark.read.format("nba")
    .option("path", "gamerotation")
    .option("resultSet", "AwayTeam")
    .option("ids", ids.mkString(","))
    .option("idsPerPartition", "5")
    .option("transport", "graft.sources.NbaTableSpec$FakeApi$")

  test("schema is probed from the endpoint; rows decode per id; partitions follow the id slices") {
    val df = reader.load()
    assert(df.columns.toSeq == Seq("GAME_ID", "PERSON_ID", "IN_TIME_REAL"))
    // 20 ids / 5 per slice = 4 input partitions — the fan-out parallelism
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 40) // two away players per game
    assert(df.select(countDistinct(col("GAME_ID"))).as[Long].head() == 20L)
  }

  test("column pruning reaches the scan (SupportsPushDownRequiredColumns)") {
    val pruned = reader.load().select(col("PERSON_ID"))
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in the plan"))
    assert(scan.output.map(_.name) == Seq("PERSON_ID"),
      s"scan must read only the selected column, got ${scan.output}")
  }

  test("a user-supplied schema casts at read time") {
    val df = reader.schema("GAME_ID string, PERSON_ID long").load()
    assert(df.schema.map(f => f.name -> f.dataType.typeName) ==
      Seq("GAME_ID" -> "string", "PERSON_ID" -> "long"))
    val rows = df.as[(String, Long)].collect()
    assert(rows.length == 40)
    assert(rows.forall { case (g, p) => g.startsWith("00224000") && p >= 201L })
  }

  test("user schema matches headers case-insensitively; a missing declared column fails loudly") {
    // collect, not count — count() would prune the columns away and never
    // exercise the binding
    val rows = reader.schema("game_id string, person_id long").load()
      .as[(String, Long)].collect()
    assert(rows.length == 40 && rows.forall { case (g, p) => g != null && p >= 201L },
      "lower-cased declared names must still bind to the API headers")
    val drifted = reader.schema("GAME_ID string, RENAMED_COLUMN long").load()
    // collect, not count: count() prunes every column away and the reader
    // never looks the drifted name up
    val e = intercept[Exception](drifted.collect())
    assert(messages(e).exists(_.contains("RENAMED_COLUMN")),
      s"API drift must name the missing column, got ${messages(e)}")
  }

  test("onError=skip: a dead id costs its rows, not the scan") {
    val withDead = reader
      .option("ids", (ids :+ "DEAD99").mkString(","))
      .option("retries", "2").option("backoffMs", "0")
    val e = intercept[Exception](withDead.load().count())
    assert(messages(e).exists(m => m.contains("DEAD") || m.contains("attempts")),
      s"default onError must fail the scan with the fetch error, got ${messages(e)}")
    val skipped = withDead.option("onError", "skip").load()
    assert(skipped.count() == 40) // the 20 healthy ids; the dead one logged
  }

  test("the probe body is reused by the scan: each id fetched exactly once") {
    NbaTableSpec.CountingApi.fetches.set(0)
    val df = reader
      .option("transport", "graft.sources.NbaTableSpec$CountingApi$")
      .load() // inferSchema probes the first id: 1 fetch
    assert(NbaTableSpec.CountingApi.fetches.get == 1)
    assert(df.collect().length == 40)
    // the scan consumed the probe's cached body for id 1 — 19 fresh
    // fetches, not 20
    assert(NbaTableSpec.CountingApi.fetches.get == ids.length,
      s"scan must reuse the probe body, got ${NbaTableSpec.CountingApi.fetches.get} fetches")
    // the body is embedded in the planned slice, so re-executing the SAME
    // Dataset replays it (the determinism a task retry needs) — only the
    // 19 unprefetched ids refetch
    assert(df.collect().length == 40)
    assert(NbaTableSpec.CountingApi.fetches.get == 2 * ids.length - 1)
    // a FRESH read probes and scans anew — the cache is consume-once, so
    // a stale body can never leak across reads
    val again = reader.option("transport", "graft.sources.NbaTableSpec$CountingApi$")
      .load()
    assert(again.collect().length == 40)
    assert(NbaTableSpec.CountingApi.fetches.get == 3 * ids.length - 1)
  }

  test("joins compose: the V2 table is a first-class relation") {
    val names = Seq((201L, "away starter"), (202L, "away bench")).toDF("PERSON_ID", "ROLE")
    val joined = reader.schema("GAME_ID string, PERSON_ID long").load()
      .join(broadcast(names), "PERSON_ID")
    assert(joined.count() == 40)
  }
}

object NbaTableSpec {
  /** FakeApi plus a JVM-wide fetch counter (local mode: driver probe and
    * partition readers share it) for the fetch-exactly-once spec. */
  object CountingApi extends Fetcher.Transport {
    val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
    def get(r: Endpoints.Request): String = { fetches.incrementAndGet(); FakeApi.get(r) }
  }

  /** Two away players per game, deterministic from the requested id. */
  object FakeApi extends Fetcher.Transport {
    def get(r: Endpoints.Request): String = {
      require(r.path == "gamerotation", s"unexpected path ${r.path}")
      val gid = r.param("GameID").get
      if (gid.startsWith("DEAD")) throw new RuntimeException(s"dead id $gid")
      s"""{"resultSets":[
           {"name":"AwayTeam","headers":["GAME_ID","PERSON_ID","IN_TIME_REAL"],
            "rowSet":[["$gid","201","0.0"],["$gid","202","3600.0"]]},
           {"name":"HomeTeam","headers":["GAME_ID","PERSON_ID","IN_TIME_REAL"],
            "rowSet":[["$gid","101","0.0"]]}]}""".replaceAll("\n\\s*", "")
    }
  }
}
