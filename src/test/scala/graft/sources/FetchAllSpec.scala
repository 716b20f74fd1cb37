package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The distributed fetch fan-out (S1's at-scale form): per-request retry
  * isolation, quarantine of terminal failures, and the fan-out -> decode
  * composition (reference analog: the ThreadPoolExecutor fan-out,
  * etl/play_by_play_with_players.py:227-239, and the per-game try/except,
  * etl/rotations.py:129-137). */
class FetchAllSpec extends SparkSpec {
  import spark.implicits._

  test("per-request retry isolation: each request owns its budget; dead requests quarantine as rows") {
    FetchAllSpec.attempts.clear()
    // healthy / flaky (2 transient failures) / dead — behavior keyed by the
    // request, attempt counts in a JVM-global map (local mode: all tasks
    // share this JVM, so the counters see every task's calls)
    val reqs = Seq(
      Endpoints.gameRotation("G_OK"),
      Endpoints.gameRotation("G_FLAKY"),
      Endpoints.gameRotation("G_DEAD")).toDS()
    val fetched = FetchAll.fetchRaw(reqs, FetchAllSpec.Flaky, retries = 4, backoffMs = 0)
      .collect()

    val byGame = fetched.map(f => f.params.head._2 -> f).toMap
    assert(byGame("G_OK").body.isDefined && byGame("G_OK").error.isEmpty)
    assert(byGame("G_FLAKY").body.isDefined, "transient failures must recover in-task")
    assert(byGame("G_DEAD").body.isEmpty)
    assert(byGame("G_DEAD").error.exists(_.contains("after 4 attempts")))
    // isolation: G_DEAD burning its budget cost G_OK and G_FLAKY nothing
    assert(FetchAllSpec.attempts.get("G_OK") == 1)
    assert(FetchAllSpec.attempts.get("G_FLAKY") == 3)
    assert(FetchAllSpec.attempts.get("G_DEAD") == 4)
  }

  test("fetchAll composes fan-out with the distributed envelope decode") {
    FetchAllSpec.attempts.clear()
    val reqs = Seq(
      Endpoints.gameRotation("G_A"),
      Endpoints.gameRotation("G_B")).toDS()
    val parsed = FetchAll.fetchAll(reqs, FetchAllSpec.Flaky, retries = 2, backoffMs = 0)
    val rows = RestDecoder.resultSet(parsed, "AwayTeam")
    assert(rows.select(col("GAME_ID")).distinct().as[String].collect().toSet ==
      Set("G_A", "G_B"))
    assert(rows.count() == 4) // two away players per game
  }

  test("failures() is exactly the quarantine side") {
    FetchAllSpec.attempts.clear()
    val reqs = Seq(
      Endpoints.gameRotation("G_OK2"),
      Endpoints.gameRotation("G_DEAD")).toDS()
    val fetched = FetchAll.fetchRaw(reqs, FetchAllSpec.Flaky, retries = 2, backoffMs = 0)
    val bad = FetchAll.failures(fetched).collect()
    assert(bad.length == 1 && bad.head.params.head._2 == "G_DEAD")
  }
}

object FetchAllSpec {
  /** JVM-global attempt counts per game id (valid in local mode only, where
    * driver and executors share the JVM — exactly what these specs run on). */
  val attempts = new java.util.concurrent.ConcurrentHashMap[String, Int]()

  /** Behavior keyed by game id: G_DEAD always fails, G_FLAKY fails its
    * first two attempts, everything else succeeds immediately. A top-level
    * object so the closure serializes without dragging the suite along. */
  object Flaky extends Fetcher.Transport {
    def get(r: Endpoints.Request): String = {
      val gid = r.param("GameID").getOrElse("?")
      val n = attempts.merge(gid, 1, (a: Int, b: Int) => a + b)
      if (gid == "G_DEAD") throw new RuntimeException(s"dead endpoint ($gid attempt $n)")
      if (gid == "G_FLAKY" && n <= 2) throw new RuntimeException(s"transient ($gid attempt $n)")
      val away = s"""{"name":"AwayTeam","headers":["GAME_ID","PERSON_ID"],"rowSet":[["$gid","201"],["$gid","202"]]}"""
      val home = s"""{"name":"HomeTeam","headers":["GAME_ID","PERSON_ID"],"rowSet":[["$gid","101"]]}"""
      s"""{"resultSets":[$away,$home]}"""
    }
  }
}
