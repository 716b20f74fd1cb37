package graft.sources

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

/** The 19 typed request builders vs the reference's parameter tuples
  * (api/smart.py:129-546) and the F11 current-season rule (:118-127). */
class EndpointsSpec extends AnyFunSuite {

  test("F11 current season: September rolls the season over (api/smart.py:118-127)") {
    assert(Endpoints.currentSeason(LocalDate.of(2024, 9, 1)) == "2024-25")
    assert(Endpoints.currentSeason(LocalDate.of(2024, 12, 31)) == "2024-25")
    assert(Endpoints.currentSeason(LocalDate.of(2025, 1, 1)) == "2024-25")
    assert(Endpoints.currentSeason(LocalDate.of(2025, 8, 31)) == "2024-25")
    assert(Endpoints.currentSeason(LocalDate.of(2025, 9, 1)) == "2025-26")
    // two-digit zero padding across the 2009-10 boundary
    assert(Endpoints.currentSeason(LocalDate.of(2009, 10, 1)) == "2009-10")
    assert(Endpoints.currentSeason(LocalDate.of(2009, 3, 1)) == "2008-09")
  }

  test("every wrapper hits its reference endpoint with the reference's tuple arity") {
    val season = "2024-25"
    def arity(r: Endpoints.Request, path: String, n: Int): Unit = {
      assert(r.path == path, s"path for $path")
      assert(r.params.length == n, s"arity for $path: got ${r.params.length}, want $n")
      assert(r.params.map(_._1).distinct.length == n, s"duplicate keys in $path")
    }
    arity(Endpoints.gameRotation("0022400236"), "gamerotation", 2)
    arity(Endpoints.teamSeasonTotals(season = season), "leaguedashteamstats", 30)
    arity(Endpoints.playerSeasonTotals(season = season), "leaguedashplayerstats", 36)
    arity(Endpoints.playerSeasonTracking(season = season,
      ptMeasureType = Endpoints.PtMeasureTypes.Drives), "leaguedashptstats", 30)
    arity(Endpoints.teamSeasonTracking(season = season,
      ptMeasureType = Endpoints.PtMeasureTypes.Passing), "leaguedashptstats", 30)
    arity(Endpoints.shootingDashboard(season = season, playerId = 203552L),
      "playerdashptshots", 18)
    arity(Endpoints.boxScoreTraditional("0022400236"), "boxscoretraditionalv2", 6)
    arity(Endpoints.boxScoreAdvanced("0022400236"), "boxscoreadvancedv2", 6)
    arity(Endpoints.seasonTraditionalBoxScore(season), "playergamelogs", 22)
    arity(Endpoints.seasonAdvancedBoxScore(season), "playergamelogs", 22)
    arity(Endpoints.winProbability("0022400236"), "winprobabilitypbp", 2)
    arity(Endpoints.playerGameLog(season = season), "leaguegamelog", 9)
    arity(Endpoints.teamsGameLog(season = season), "leaguegamelog", 9)
    arity(Endpoints.playByPlay("0022400236"), "playbyplayv2", 3)
    arity(Endpoints.defensiveMatchups(season = season), "leagueseasonmatchups", 10)
    arity(Endpoints.shotChartDetail(203552L, 1610612766L, season = season),
      "shotchartdetail", 31)
    arity(Endpoints.foulChartDetail(203552L, 1610612766L, season = season),
      "shotchartdetail", 31)
  }

  test("the v2/v2-style endpoints keep the reference's lower-camel keys") {
    val pbp = Endpoints.playByPlay("0022400236", 1, 4)
    assert(pbp.params == Seq(
      "gameId" -> "0022400236", "startPeriod" -> "1", "endPeriod" -> "4"))
    val box = Endpoints.boxScoreTraditional("0022400236")
    assert(box.params.map(_._1) ==
      Seq("gameId", "startPeriod", "endPeriod", "startRange", "endRange", "rangeType"))
    assert(box.param("endRange").contains(Int.MaxValue.toString))
    val adv = Endpoints.boxScoreAdvanced("0022400236")
    assert(adv.params.map(_._1) ==
      Seq("EndPeriod", "EndRange", "GameID", "RangeType", "StartPeriod", "StartRange"))
    val shots = Endpoints.shotChartDetail(203552L, 1610612766L)
    assert(shots.param("contextMeasure").contains("FGA"))
    assert(Endpoints.foulChartDetail(203552L, 1610612766L)
      .param("contextMeasure").contains("PF"))
    assert(shots.params.head._1 == "leagueId" && shots.params.last._1 == "contextMeasure")
  }

  test("boxScoreForPeriod slices with the F2 bounds in tenths, nudged 5 inward (players_on_court:24-31,42-53)") {
    val p1 = Endpoints.boxScoreForPeriod("0022400236", 1)
    assert(p1.param("startRange").contains("5") && p1.param("endRange").contains("7195"))
    assert(p1.param("rangeType").contains("2"))
    assert(p1.param("startPeriod").contains("1") && p1.param("endPeriod").contains("1"))
    val ot1 = Endpoints.boxScoreForPeriod("0022400236", 5)
    assert(ot1.param("startRange").contains("28805") && ot1.param("endRange").contains("31795"))
  }

  test("tracking stats mirrors the reference's required-argument raises") {
    intercept[IllegalArgumentException] {
      Endpoints.seasonTrackingStats(ptMeasureType = "", playerOrTeam = "Player")
    }
    intercept[IllegalArgumentException] {
      Endpoints.seasonTrackingStats(
        ptMeasureType = Endpoints.PtMeasureTypes.Drives, playerOrTeam = "Both")
    }
  }

  test("withParams overrides in place and appends unknown keys in order") {
    val r = Endpoints.playByPlay("g1").withParams("startPeriod" -> "2", "Extra" -> "x")
    assert(r.params == Seq(
      "gameId" -> "g1", "startPeriod" -> "2", "endPeriod" -> "14", "Extra" -> "x"))
  }
}
