package graft.nba

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The WHOLE reference workflow, raw-less, chained end to end against one
  * fake stats API: fetch + land + enrich + publish for rotations /
  * play_by_play / team_game_log (IngestMain), the period-starters ETL with
  * its own box-score fetch (StartersMain), then the flagship lineup
  * tracker over the published tables (PipelineMain). One game, one
  * substitution — every stage's output feeds the next exactly as the
  * reference scripts chain through their Postgres warehouse. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("fetch -> ingest -> starters -> flagship lineup tracking, raw-less") {
    val root = Files.createTempDirectory("graft_e2e").toString
    val in = s"$root/in" // landed raw
    val wh = s"$root/warehouse" // published tables
    val out = s"$root/final" // flagship output
    def args(table: Option[String] = None) = PipelineArgs.Args(
      season = Some("2024-25"), seasonType = Some("Regular Season"),
      input = in, output = wh, table = table)
    val api = Some(EndToEndSpec.RichStatsApi)

    IngestMain.runWith(spark, args(Some("rotations")), api)
    IngestMain.runWith(spark, args(Some("play_by_play")), api)
    IngestMain.runWith(spark, args(Some("team_game_log")), api)
    // starters read the published pbp and fetch their own box slices
    StartersMain.runWith(spark,
      args().copy(input = wh, output = wh), api)
    // the flagship consumes only published tables — no transport
    PipelineMain.runWith(spark, args().copy(input = wh, output = out))

    val starters = spark.read.parquet(s"$wh/${StartersMain.TableName}")
    assert(starters.count() == 10, "one 5v5 period, sub-ins excluded")
    assert(!starters.select("PLAYER_ID").as[Long].collect().contains(6L),
      "player 6 enters by substitution and must not be a starter")

    val lineups = spark.read.parquet(s"$out/play_by_play_with_players")
      .orderBy(col("EVENTNUM"))
    val got = lineups.select(
      col("EVENTNUM"),
      array((1 to 5).map(i => col(s"TEAM1_PLAYER$i")): _*).as("t1"),
      array((1 to 5).map(i => col(s"TEAM2_PLAYER$i")): _*).as("t2"))
      .as[(Long, Seq[Long], Seq[Long])].collect().toSeq
    val before = Seq(1L, 2L, 3L, 4L, 5L)
    val after = Seq(1L, 2L, 4L, 5L, 6L) // 3 out, 6 in, re-sorted
    val home = Seq(11L, 12L, 13L, 14L, 15L)
    assert(got == Seq(
      (1L, before, home), (2L, before, home),
      (3L, after, home), (4L, after, home)))
    assert(lineups.select("SEASON").distinct().as[String].head() == "2024-25")
    assert(spark.read.parquet(s"$out/lineup_errors").count() == 0)
    // every fetch quarantine is empty — the chain was fully healthy
    assert(spark.read.parquet(s"$in/rotations_fetch_errors").count() == 0)
    assert(spark.read.parquet(s"$wh/${Fetch.BoxTable}_fetch_errors").count() == 0)
  }
}

object EndToEndSpec {

  /** One game, 5v5 + one substitution, served across all four endpoints
    * the chain fetches. Away team 100 (players 1-5 start, 3 subs out for 6
    * at game-clock 6:00 of period 1), home team 200 (players 11-15 go the
    * distance). */
  object RichStatsApi extends graft.sources.Fetcher.Transport {
    private val G = "0022400001"

    private def rs(name: String, headers: Seq[String], rows: Seq[Seq[Any]]): String = {
      def cell(v: Any): String = v match {
        case null => "null"
        case other => "\"" + other.toString + "\""
      }
      val h = headers.map("\"" + _ + "\"").mkString("[", ",", "]")
      val r = rows.map(_.map(cell).mkString("[", ",", "]")).mkString("[", ",", "]")
      s"""{"name":"$name","headers":$h,"rowSet":$r}"""
    }

    def get(r: graft.sources.Endpoints.Request): String = r.path match {
      case "leaguegamelog" =>
        s"""{"resultSets":[${rs("LeagueGameLog",
          Seq("GAME_ID", "TEAM_ID", "TEAM_ABBREVIATION", "GAME_DATE", "MATCHUP", "WL", "PTS"),
          Seq(
            Seq(G, "100", "AWY", "2024-11-01", "AWY @ HOM", "W", "101.0"),
            Seq(G, "200", "HOM", "2024-11-01", "HOM vs. AWY", "L", "99.0")))}]}"""

      case "gamerotation" =>
        val hdr = Seq("GAME_ID", "TEAM_ID", "TEAM_CITY", "TEAM_NAME", "PERSON_ID",
          "PLAYER_FIRST", "PLAYER_LAST", "IN_TIME_REAL", "OUT_TIME_REAL",
          "PLAYER_PTS", "PT_DIFF", "USG_PCT")
        def row(team: String, pid: Long, in: Double, outT: Double) =
          Seq(G, team, "City", "T" + team, pid.toString, "F" + pid, "L" + pid,
            in.toString, outT.toString, "10.0", "2.0", "0.2")
        val away = rs("AwayTeam", hdr,
          Seq(1L, 2L, 4L, 5L).map(p => row("100", p, 0.0, 28800.0)) ++
            Seq(row("100", 3L, 0.0, 3600.0), row("100", 6L, 3600.0, 28800.0)))
        val home = rs("HomeTeam", hdr,
          Seq(11L, 12L, 13L, 14L, 15L).map(p => row("200", p, 0.0, 28800.0)))
        s"""{"resultSets":[$away,$home]}"""

      case "playbyplayv2" =>
        val hdr = Seq("GAME_ID", "EVENTNUM", "EVENTMSGTYPE", "EVENTMSGACTIONTYPE",
          "PERIOD", "PCTIMESTRING", "HOMEDESCRIPTION", "NEUTRALDESCRIPTION",
          "VISITORDESCRIPTION", "PLAYER1_ID", "PLAYER1_TEAM_ID",
          "PLAYER2_ID", "PLAYER2_TEAM_ID", "PLAYER3_ID", "PLAYER3_TEAM_ID")
        def ev(num: Int, typ: Int, clock: String, p1: Long, t1: Long,
            p2: Any = null, t2: Any = null) =
          Seq(G, num.toString, typ.toString, "0", "1", clock, null, "d", null,
            p1.toString, t1.toString, p2, t2, null, null)
        s"""{"resultSets":[${rs("PlayByPlay", hdr, Seq(
          ev(1, 10, "12:00", 1L, 100L, "11", "200"), // opening jump ball
          ev(2, 1, "10:00", 2L, 100L), // made shot
          ev(3, 8, "6:00", 3L, 100L, "6", "100"), // sub: 3 out, 6 in
          ev(4, 1, "2:00", 12L, 200L)))}]}"""

      case "boxscoretraditionalv2" =>
        // period-sliced: every player who touched the floor in period 1
        val rows = (Seq(1L, 2L, 3L, 4L, 5L, 6L).map(p => (p, 100L)) ++
          Seq(11L, 12L, 13L, 14L, 15L).map(p => (p, 200L)))
          .map { case (p, t) => Seq(G, t.toString, p.toString, "8:30") }
        s"""{"resultSets":[${rs("PlayerStats",
          Seq("GAME_ID", "TEAM_ID", "PLAYER_ID", "MIN"), rows)}]}"""

      case other => throw new RuntimeException(s"unexpected endpoint $other")
    }
  }
}
