package graft.sources

import java.time.LocalDate

/** Catalog of the stats-API surface the reference wraps — all 19 wrapper
  * methods of api/smart.py:129-546 (SURVEY.md §2.1 S3) as typed request
  * builders. Each builder carries the EXACT ordered parameter tuple its
  * reference method sends, including the mostly-empty filter defaults and
  * the API's inconsistent key casing (playbyplayv2, boxscoretraditionalv2
  * and shotchartdetail take lower-camel keys; the dashboards upper-camel).
  * Five are exercised by the reference ETL (marked); the rest are dead
  * surface in the ETL but part of the reference's API contract.
  *
  * Requests are pure descriptors — the HTTP half is Fetcher (S1/S2), and
  * at scale the fan-out over ids runs as mapPartitions over a dataset of
  * Requests, so builders must be cheap, deterministic and serializable.
  */
object Endpoints {

  final case class Request(path: String, params: Seq[(String, String)]) {
    /** First value for `key`, if present (tuples are ordered, keys unique). */
    def param(key: String): Option[String] =
      params.collectFirst { case (k, v) if k == key => v }
    /** Override-or-append, preserving tuple order for untouched keys. */
    def withParams(extra: (String, String)*): Request = {
      val overridden = params.map { case (k, v) =>
        k -> extra.collectFirst { case (ek, ev) if ek == k => ev }.getOrElse(v)
      }
      val appended = extra.filterNot { case (k, _) => params.exists(_._1 == k) }
      copy(params = overridden ++ appended)
    }
  }

  /** reference api/smart.py:44-48 */
  object PerMode {
    val Totals = "Totals"; val PerGame = "PerGame"
    val Per100 = "Per100Possessions"; val Per36 = "Per36"
    val Default: String = Totals
  }

  /** reference api/smart.py:52-57 */
  object SeasonTypes {
    val RegularSeason = "Regular Season"; val Playoffs = "Playoffs"
    val PreSeason = "Pre Season"; val IST = "IST"
    val Default: String = RegularSeason
  }

  /** reference api/smart.py:60-68 */
  object MeasureTypes {
    val Base = "Base"; val Advanced = "Advanced"; val Misc = "Misc"
    val Scoring = "Scoring"; val Usage = "Usage"; val Defense = "Defense"
    val FourFactors = "Four Factors"
    val Default: String = Base
  }

  /** reference api/smart.py:71-83 */
  object PtMeasureTypes {
    val Drives = "Drives"; val Defense = "Defense"
    val CatchAndShoot = "CatchShoot"; val Passing = "Passing"
    val Touches = "Possessions"; val PullUp = "PullUpShot"
    val Rebounding = "Rebounding"; val Efficiency = "Efficiency"
    val SpeedDistance = "SpeedDistance"; val ElbowTouches = "ElbowTouch"
    val PostTouches = "PostTouch"; val PaintTouches = "PaintTouch"
  }

  val DefaultLeague = "00"

  /** F11 current-season derivation (reference api/smart.py:118-127):
    * seasons roll over in September — month > 8 yields "<y>-<y+1 % 100>",
    * else "<y-1>-<y % 100>". Pure in the date so it is testable; callers
    * wanting the reference's wall-clock behavior pass nothing. */
  def currentSeason(today: LocalDate = LocalDate.now()): String = {
    val y = today.getYear
    if (today.getMonthValue > 8) f"$y-${(y + 1) % 100}%02d"
    else f"${y - 1}-${y % 100}%02d"
  }

  /** 1. exercised: rotations ingest (api/smart.py:129-134, etl/rotations.py:18). */
  def gameRotation(gameId: String, leagueId: String = DefaultLeague): Request =
    Request("gamerotation", Seq("GameID" -> gameId, "LeagueID" -> leagueId))

  /** 2. leaguedashteamstats (api/smart.py:136-173). */
  def teamSeasonTotals(
      perMode: String = PerMode.Default,
      season: String = currentSeason(),
      seasonType: String = SeasonTypes.Default,
      measureType: String = MeasureTypes.Default): Request =
    Request("leaguedashteamstats", Seq(
      "Conference" -> "", "DateFrom" -> "", "DateTo" -> "", "Division" -> "",
      "GameScope" -> "", "GameSegment" -> "", "LastNGames" -> "0",
      "LeagueID" -> DefaultLeague, "Location" -> "",
      "MeasureType" -> measureType, "Month" -> "0", "OpponentTeamID" -> "0",
      "Outcome" -> "", "PORound" -> "0", "PaceAdjust" -> "N",
      "PerMode" -> perMode, "Period" -> "0", "PlayerExperience" -> "",
      "PlayerPosition" -> "", "PlusMinus" -> "N", "Rank" -> "N",
      "Season" -> season, "SeasonSegment" -> "", "SeasonType" -> seasonType,
      "ShotClockRange" -> "", "StarterBench" -> "", "TeamID" -> "0",
      "TwoWay" -> "0", "VsConference" -> "", "VsDivision" -> ""))

  /** 3. leaguedashplayerstats (api/smart.py:175-219). */
  def playerSeasonTotals(
      perMode: String = PerMode.Default,
      season: String = currentSeason(),
      seasonType: String = SeasonTypes.Default,
      measureType: String = MeasureTypes.Default): Request =
    Request("leaguedashplayerstats", Seq(
      "College" -> "", "Conference" -> "", "Country" -> "", "DateFrom" -> "",
      "DateTo" -> "", "Division" -> "", "DraftPick" -> "", "DraftYear" -> "",
      "GameScope" -> "", "GameSegment" -> "", "Height" -> "",
      "LastNGames" -> "0", "LeagueID" -> DefaultLeague, "Location" -> "",
      "MeasureType" -> measureType, "Month" -> "0", "OpponentTeamID" -> "0",
      "Outcome" -> "", "PORound" -> "0", "PaceAdjust" -> "N",
      "PerMode" -> perMode, "Period" -> "0", "PlayerExperience" -> "",
      "PlayerPosition" -> "", "PlusMinus" -> "N", "Rank" -> "N",
      "Season" -> season, "SeasonSegment" -> "", "SeasonType" -> seasonType,
      "ShotClockRange" -> "", "StarterBench" -> "", "TeamID" -> "0",
      "TwoWay" -> "0", "VsConference" -> "", "VsDivision" -> "",
      "Weight" -> ""))

  /** 4. player tracking delegate (api/smart.py:221-224). */
  def playerSeasonTracking(season: String = currentSeason(),
      seasonType: String = SeasonTypes.Default, ptMeasureType: String,
      perMode: String = PerMode.Default): Request =
    seasonTrackingStats(season, seasonType, ptMeasureType, perMode, "Player")

  /** 5. team tracking delegate (api/smart.py:226-229). */
  def teamSeasonTracking(season: String = currentSeason(),
      seasonType: String = SeasonTypes.Default, ptMeasureType: String,
      perMode: String = PerMode.Default): Request =
    seasonTrackingStats(season, seasonType, ptMeasureType, perMode, "Team")

  /** 6. leaguedashptstats (api/smart.py:231-273); the reference raises
    * without a PtMeasureType / Player-or-Team, mirrored as requires. */
  def seasonTrackingStats(season: String = currentSeason(),
      seasonType: String = SeasonTypes.Default, ptMeasureType: String,
      perMode: String = PerMode.Default, playerOrTeam: String): Request = {
    require(ptMeasureType.nonEmpty, "Must provide a MeasureType")
    require(playerOrTeam == "Player" || playerOrTeam == "Team",
      "Must provide either Player or Team")
    Request("leaguedashptstats", Seq(
      "College" -> "", "Conference" -> "", "Country" -> "", "DateFrom" -> "",
      "DateTo" -> "", "Division" -> "", "DraftPick" -> "", "DraftYear" -> "",
      "GameScope" -> "", "Height" -> "", "LastNGames" -> "0",
      "LeagueID" -> DefaultLeague, "Location" -> "", "Month" -> "0",
      "OpponentTeamID" -> "0", "Outcome" -> "", "PORound" -> "0",
      "PerMode" -> perMode, "PlayerExperience" -> "",
      "PlayerOrTeam" -> playerOrTeam, "PlayerPosition" -> "",
      "PtMeasureType" -> ptMeasureType, "Season" -> season,
      "SeasonSegment" -> "", "SeasonType" -> seasonType,
      "StarterBench" -> "", "TeamID" -> "0", "VsConference" -> "",
      "VsDivision" -> "", "Weight" -> ""))
  }

  /** 7. playerdashptshots (api/smart.py:275-304). */
  def shootingDashboard(season: String = currentSeason(),
      seasonType: String = SeasonTypes.Default, playerId: Long,
      perMode: String = PerMode.Default): Request =
    Request("playerdashptshots", Seq(
      "DateFrom" -> "", "DateTo" -> "", "GameSegment" -> "",
      "LastNGames" -> "0", "LeagueID" -> DefaultLeague, "Location" -> "",
      "Month" -> "0", "OpponentTeamID" -> "0", "Outcome" -> "",
      "PerMode" -> perMode, "Period" -> "0",
      "PlayerID" -> playerId.toString, "Season" -> season,
      "SeasonSegment" -> "", "SeasonType" -> seasonType, "TeamID" -> "0",
      "VsConference" -> "", "VsDivision" -> ""))

  /** 8. exercised: period starters primary path (api/smart.py:306-330,
    * etl/players_on_court_at_start_of_period.py:42-58). Lower-camel keys —
    * that is what this v2 endpoint takes and exactly what the reference
    * sends. */
  def boxScoreTraditional(gameId: String, startPeriod: Int = 0,
      endPeriod: Int = 14, startRange: Long = 0,
      endRange: Long = Int.MaxValue.toLong, rangeType: Int = 0): Request =
    Request("boxscoretraditionalv2", Seq(
      "gameId" -> gameId, "startPeriod" -> startPeriod.toString,
      "endPeriod" -> endPeriod.toString, "startRange" -> startRange.toString,
      "endRange" -> endRange.toString, "rangeType" -> rangeType.toString))

  /** The one period-sliced fetch the starters ETL issues
    * (etl/players_on_court_at_start_of_period.py:24-31,42-53): RangeType 2
    * with the F2 period bounds in tenths, nudged 5 tenths inward. */
  def boxScoreForPeriod(gameId: String, period: Int): Request = {
    import graft.functions.GameClock.{OvertimePeriodSec, RegulationPeriodSec, RegulationTotalSec}
    val startSec = if (period <= 4) (period - 1) * RegulationPeriodSec
                   else RegulationTotalSec + (period - 5) * OvertimePeriodSec
    val endSec = startSec + (if (period <= 4) RegulationPeriodSec else OvertimePeriodSec)
    boxScoreTraditional(gameId, period, period,
      startSec * 10L + 5, endSec * 10L - 5, rangeType = 2)
  }

  /** 9. boxscoreadvancedv2 (api/smart.py:332-356) — upper-camel keys, in
    * the reference's (End*, Game, Range, Start*) order. */
  def boxScoreAdvanced(gameId: String, startPeriod: Int = 0,
      endPeriod: Int = 14, startRange: Long = 0,
      endRange: Long = Int.MaxValue.toLong, rangeType: Int = 0): Request =
    Request("boxscoreadvancedv2", Seq(
      "EndPeriod" -> endPeriod.toString, "EndRange" -> endRange.toString,
      "GameID" -> gameId, "RangeType" -> rangeType.toString,
      "StartPeriod" -> startPeriod.toString,
      "StartRange" -> startRange.toString))

  /** 10/11. playergamelogs season box scores (api/smart.py:358-390). */
  def seasonTraditionalBoxScore(season: String = currentSeason(),
      seasonType: String = SeasonTypes.Default): Request =
    seasonBoxScores(season, seasonType, MeasureTypes.Base)

  def seasonAdvancedBoxScore(season: String = currentSeason(),
      seasonType: String = SeasonTypes.Default): Request =
    seasonBoxScores(season, seasonType, MeasureTypes.Advanced)

  private def seasonBoxScores(season: String, seasonType: String,
      measureType: String): Request =
    Request("playergamelogs", Seq(
      "DateFrom" -> "", "DateTo" -> "", "GameSegment" -> "",
      "LastNGames" -> "0", "LeagueID" -> DefaultLeague, "Location" -> "",
      "MeasureType" -> measureType, "Month" -> "0", "OpponentTeamID" -> "0",
      "Outcome" -> "", "PORound" -> "0", "PaceAdjust" -> "N",
      "PerMode" -> "Totals", "Period" -> "0", "PlusMinus" -> "N",
      "Rank" -> "N", "Season" -> season, "SeasonSegment" -> "",
      "SeasonType" -> seasonType, "ShotClockRange" -> "",
      "VsConference" -> "", "VsDivision" -> ""))

  /** 12. winprobabilitypbp (api/smart.py:392-399). */
  def winProbability(gameId: String): Request =
    Request("winprobabilitypbp", Seq(
      "GameID" -> gameId, "RunType" -> "each second"))

  /** 13. player game log delegate (api/smart.py:401-404). */
  def playerGameLog(seasonType: String = SeasonTypes.Default,
      season: String = currentSeason(), leagueId: String = DefaultLeague,
      dateTo: String = "", dateFrom: String = "",
      measureType: String = MeasureTypes.Base): Request =
    leagueGameLog("P", seasonType, season, leagueId, dateTo, dateFrom, measureType)

  /** 14. exercised: game-log ingest delegate (api/smart.py:406-409,
    * etl/team_game_log.py:22). */
  def teamsGameLog(seasonType: String = SeasonTypes.Default,
      season: String = currentSeason(), leagueId: String = DefaultLeague,
      dateTo: String = "", dateFrom: String = "",
      measureType: String = MeasureTypes.Base): Request =
    leagueGameLog("T", seasonType, season, leagueId, dateTo, dateFrom, measureType)

  /** leaguegamelog (api/smart.py:427-457); sorted DATE ascending like the
    * reference (:452-453) so ingest order is deterministic. */
  def leagueGameLog(playerOrTeam: String,
      seasonType: String = SeasonTypes.Default,
      season: String = currentSeason(), leagueId: String = DefaultLeague,
      dateTo: String = "", dateFrom: String = "",
      measureType: String = MeasureTypes.Base): Request = {
    require(playerOrTeam == "P" || playerOrTeam == "T",
      "playerOrTeam must be 'P' or 'T'")
    Request("leaguegamelog", Seq(
      "DateFrom" -> dateFrom, "DateTo" -> dateTo, "LeagueID" -> leagueId,
      "Season" -> season, "SeasonType" -> seasonType,
      "playerOrTeam" -> playerOrTeam, "sorter" -> "DATE",
      "direction" -> "ASC", "MeasureType" -> measureType))
  }

  /** 15. exercised: pbp ingest (api/smart.py:411-425, etl/play_by_play.py)
    * — lower-camel keys, exactly as the reference sends them. */
  def playByPlay(gameId: String, startPeriod: Int = 0, endPeriod: Int = 14): Request =
    Request("playbyplayv2", Seq(
      "gameId" -> gameId, "startPeriod" -> startPeriod.toString,
      "endPeriod" -> endPeriod.toString))

  /** 16. leagueseasonmatchups (api/smart.py:459-478). The reference
    * defaults season_type to default_season — a latent bug (a season
    * string where a season type belongs) we do not reproduce. */
  def defensiveMatchups(season: String = currentSeason(),
      seasonType: String = SeasonTypes.Default): Request =
    Request("leagueseasonmatchups", Seq(
      "DateFrom" -> "", "DateTo" -> "", "DefPlayerID" -> "",
      "OffPlayerID" -> "", "LeagueID" -> DefaultLeague, "Outcome" -> "",
      "PORound" -> "0", "PerMode" -> "Totals", "Season" -> season,
      "SeasonType" -> seasonType))

  /** 17. exercised: shot-chart ingest (api/smart.py:480-484,
    * etl/shot_details.py) — ContextMeasure FGA. */
  def shotChartDetail(playerId: Long, teamId: Long, gameId: String = "",
      season: String = currentSeason(),
      seasonType: String = SeasonTypes.Default,
      leagueId: String = DefaultLeague): Request =
    shotChartDetailData(playerId, teamId, gameId, season, seasonType, leagueId, "FGA")

  /** 18. foul chart: same endpoint, ContextMeasure PF (api/smart.py:486-490). */
  def foulChartDetail(playerId: Long, teamId: Long, gameId: String = "",
      season: String = currentSeason(),
      seasonType: String = SeasonTypes.Default,
      leagueId: String = DefaultLeague): Request =
    shotChartDetailData(playerId, teamId, gameId, season, seasonType, leagueId, "PF")

  /** 19. shotchartdetail (api/smart.py:492-545) — the full 31-key
    * lower-camel tuple. */
  def shotChartDetailData(playerId: Long, teamId: Long, gameId: String = "",
      season: String = currentSeason(),
      seasonType: String = SeasonTypes.Default,
      leagueId: String = DefaultLeague, context: String): Request = {
    require(context.nonEmpty, "Must provide a context measure")
    Request("shotchartdetail", Seq(
      "leagueId" -> leagueId, "season" -> season, "seasonType" -> seasonType,
      "teamId" -> teamId.toString, "playerId" -> playerId.toString,
      "gameID" -> gameId, "outcome" -> "", "location" -> "", "month" -> "0",
      "seasonSegment" -> "", "dateFrom" -> "", "dateTo" -> "",
      "opponentTeamId" -> "0", "vsConference" -> "", "vsDivision" -> "",
      "position" -> "", "playerPosition" -> "", "rookieYear" -> "",
      "gameSegment" -> "", "period" -> "0", "lastNGames" -> "0",
      "clutchTime" -> "", "aheadBehind" -> "", "pointDiff" -> "",
      "rangeType" -> "0", "startPeriod" -> "1", "endPeriod" -> "10",
      "startRange" -> "0", "endRange" -> Int.MaxValue.toString,
      "contextFilter" -> "", "contextMeasure" -> context))
  }
}
