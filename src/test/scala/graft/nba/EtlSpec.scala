package graft.nba

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("teamGameLog stamps season/type/id and zeroes numeric nulls (etl/team_game_log.py:27-30)") {
    val raw = Seq(("0022400061", 10L, Some(110.0)), ("0022400061", 20L, None))
      .toDF("GAME_ID", "TEAM_ID", "PTS")
    val got = Etl.teamGameLog(raw, "2024-25", "Regular Season")
    val rows = got.select(col("id"), col("SEASON"), col("SEASON_TYPE"), col("PTS"))
      .as[(String, String, String, Double)].collect().toSet
    assert(rows == Set(
      ("0022400061-10", "2024-25", "Regular Season", 110.0),
      ("0022400061-20", "2024-25", "Regular Season", 0.0)))
  }

  test("playByPlay derives season from the game id and dedups full rows (etl/play_by_play.py:28-34)") {
    val raw = Seq(
      ("0022400061", 1L), ("0022400061", 1L), // exact dup collapses
      ("0042300101", 2L))
      .toDF("GAME_ID", "EVENTNUM")
    val got = Etl.playByPlay(raw)
    assert(got.count() == 2)
    val playoff = got.filter(col("GAME_ID") === "0042300101")
      .select(col("id"), col("SEASON"), col("SEASON_TYPE"))
      .as[(String, String, String)].head()
    assert(playoff == (("0042300101-2", "2023-24", "Playoffs")))
  }

  test("shotCombosToFetch: composite-key anti-join (etl/shot_details.py:28-51, J8)") {
    val rotations = Seq(
      (1L, 10L, "2024-25", "Regular Season"),
      (1L, 10L, "2024-25", "Regular Season"), // dup combo collapses
      (2L, 10L, "2024-25", "Regular Season"),
      (1L, 10L, "2023-24", "Regular Season")) // same player, older season
      .toDF("PLAYER_ID", "TEAM_ID", "SEASON", "SEASON_TYPE")
    val existing = Seq((1L, 10L, "2024-25", "Regular Season"))
      .toDF("PLAYER_ID", "TEAM_ID", "SEASON", "SEASON_TYPE")
    val got = Etl.shotCombosToFetch(rotations, existing)
      .as[(Long, Long, String, String)].collect().toSet
    assert(got == Set(
      (2L, 10L, "2024-25", "Regular Season"),
      (1L, 10L, "2023-24", "Regular Season")))
  }
}
