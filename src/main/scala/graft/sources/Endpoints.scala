package graft.sources

/** Catalog of the stats-API endpoints the reference wraps
  * (reference: api/smart.py:129-546; SURVEY.md §2.1 S3). Five are exercised
  * by the reference ETL (marked), the rest are dead surface it still
  * exposes — cataloged here so a user of the reference finds every entry
  * point, implemented as plain request descriptors: endpoint path + the
  * full parameter tuple the API expects (mostly-empty defaults, exactly as
  * the reference sends them).
  */
object Endpoints {

  final case class Request(path: String, params: Map[String, String]) {
    def withParams(extra: (String, String)*): Request =
      copy(params = params ++ extra)
  }

  private def season(s: String) = "Season" -> s
  private def seasonType(st: String) = "SeasonType" -> st

  /** exercised: rotations ingest (api/smart.py:129-134, etl/rotations.py:18). */
  def gameRotation(gameId: String): Request =
    Request("gamerotation", Map("GameID" -> gameId, "LeagueID" -> "00"))

  /** exercised: pbp ingest (api/smart.py:411-425, etl/play_by_play.py). */
  def playByPlay(gameId: String, startPeriod: Int = 0, endPeriod: Int = 14): Request =
    Request("playbyplayv2", Map(
      "GameID" -> gameId,
      "StartPeriod" -> startPeriod.toString,
      "EndPeriod" -> endPeriod.toString))

  /** exercised: game-log ingest (api/smart.py:427-457, etl/team_game_log.py:22);
    * sorted DATE ascending like the reference (:450-451). */
  def leagueGameLog(seasonStr: String, seasonTypeStr: String): Request =
    Request("leaguegamelog", Map(
      "Counter" -> "1000", "DateFrom" -> "", "DateTo" -> "", "Direction" -> "ASC",
      "LeagueID" -> "00", "PlayerOrTeam" -> "T", "Sorter" -> "DATE",
      season(seasonStr), seasonType(seasonTypeStr)))

  /** exercised: period starters fallback (api/smart.py:306-330,
    * etl/players_on_court_at_start_of_period.py:42-58). */
  def boxScoreTraditional(gameId: String, startPeriod: Int, endPeriod: Int,
      startRange: Int, endRange: Int, rangeType: Int): Request =
    Request("boxscoretraditionalv2", Map(
      "GameID" -> gameId, "StartPeriod" -> startPeriod.toString,
      "EndPeriod" -> endPeriod.toString, "StartRange" -> startRange.toString,
      "EndRange" -> endRange.toString, "RangeType" -> rangeType.toString))

  /** exercised: shot-chart ingest (api/smart.py:481-546, etl/shot_details.py). */
  def shotChartDetail(playerId: Long, teamId: Long, seasonStr: String,
      seasonTypeStr: String): Request =
    Request("shotchartdetail", Map(
      "PlayerID" -> playerId.toString, "TeamID" -> teamId.toString,
      "ContextMeasure" -> "FGA", "LastNGames" -> "0", "LeagueID" -> "00",
      "Month" -> "0", "OpponentTeamID" -> "0", "Period" -> "0",
      "PlayerPosition" -> "", "RookieYear" -> "",
      season(seasonStr), seasonType(seasonTypeStr)))

  /** dead surface in the reference, cataloged for completeness
    * (api/smart.py: team/player season totals :136-219, tracking :221-273,
    * shooting dashboards :275-304, advanced box scores :332-390,
    * win probability :392-399, defensive matchups :459-479). */
  val uncalledEndpoints: Seq[String] = Seq(
    "leaguedashteamstats", "leaguedashplayerstats", "leaguedashptstats",
    "leaguedashteamptshot", "leaguedashplayerptshot", "boxscoreadvancedv2",
    "boxscorescoringv2", "boxscoremiscv2", "boxscoreusagev2",
    "boxscorefourfactorsv2", "boxscoreplayertrackv2", "winprobabilitypbp",
    "leagueseasonmatchups", "boxscorehustlev2")

  def uncalled(path: String): Request = {
    require(uncalledEndpoints.contains(path), s"unknown endpoint $path")
    Request(path, Map("LeagueID" -> "00"))
  }
}
