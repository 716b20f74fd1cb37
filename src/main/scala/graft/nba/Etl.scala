package graft.nba

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GameIds

/** The three thin ingest jobs, as pure DataFrame transforms (HTTP fetch and
  * sink live in graft.sources; these are the enrich/dedup/delta stages
  * between them).
  */
object Etl {

  /** team_game_log ingest enrichment (reference: etl/team_game_log.py:22-33):
    * stamp SEASON/SEASON_TYPE, synthesize id on (GAME_ID, TEAM_ID),
    * normalize nulls. */
  def teamGameLog(raw: DataFrame, season: String, seasonType: String): DataFrame =
    GameIds.fillNulls(
      raw.withColumn("SEASON", lit(season))
        .withColumn("SEASON_TYPE", lit(seasonType))
        .withColumn("id", GameIds.syntheticId(col("GAME_ID"), col("TEAM_ID"))))

  /** Same enrichment with SEASON/SEASON_TYPE derived from the game id
    * (F3/F4) instead of passed through — equivalent values (the reference
    * stamps its season args, which the game id encodes), usable when the
    * landed raw table spans seasons. */
  def teamGameLog(raw: DataFrame): DataFrame =
    GameIds.fillNulls(
      raw.withColumn("SEASON", GameIds.extractSeason(col("GAME_ID")))
        .withColumn("SEASON_TYPE", GameIds.extractSeasonType(col("GAME_ID")))
        .withColumn("id", GameIds.syntheticId(col("GAME_ID"), col("TEAM_ID"))))

  /** play_by_play ingest enrichment (reference: etl/play_by_play.py:21-36):
    * stamp GAME_ID-derived SEASON/SEASON_TYPE (F3/F4), id on
    * (GAME_ID, EVENTNUM), full-row dedup, null normalization. */
  def playByPlay(raw: DataFrame): DataFrame =
    GameIds.fillNulls(
      raw.withColumn("SEASON", GameIds.extractSeason(col("GAME_ID")))
        .withColumn("SEASON_TYPE", GameIds.extractSeasonType(col("GAME_ID")))
        .withColumn("id", GameIds.syntheticId(col("GAME_ID"), col("EVENTNUM")))
        .dropDuplicates())

  /** shot_details ingest enrichment (reference: etl/shot_details.py:10-26):
    * id on (PLAYER_ID, GAME_ID, GAME_EVENT_ID) when the event columns are
    * present, else on the fetch-combo key — the reference checks the same
    * way, per fetched frame; here the schema decides once at plan time —
    * then full-row dedup and null normalization. The raw frame must carry
    * PLAYER_ID/TEAM_ID/SEASON/SEASON_TYPE (the fetch stage stamps them). */
  def shotDetails(raw: DataFrame): DataFrame = {
    val idCol =
      if (raw.columns.contains("GAME_ID") && raw.columns.contains("GAME_EVENT_ID"))
        GameIds.syntheticId(col("PLAYER_ID"), col("GAME_ID"), col("GAME_EVENT_ID"))
      else
        GameIds.syntheticId(col("PLAYER_ID"), col("TEAM_ID"),
          col("SEASON"), col("SEASON_TYPE"))
    GameIds.fillNulls(raw.withColumn("id", idCol).dropDuplicates())
  }

  /** shot_details delta driver (reference: etl/shot_details.py:28-51, J8):
    * the distinct (PLAYER_ID, TEAM_ID, SEASON, SEASON_TYPE) combos present
    * in rotations but absent from shot_details — the composite-key
    * anti-join that decides which shot charts to fetch. */
  def shotCombosToFetch(rotations: DataFrame, shotDetails: DataFrame): DataFrame = {
    val keys = Seq("PLAYER_ID", "TEAM_ID", "SEASON", "SEASON_TYPE")
    Upsert.deltaNew(
      shotDetails.select(keys.map(col): _*),
      rotations.select(keys.map(col): _*).distinct(),
      keys)
  }
}
