package graft.nba

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GameIds

/** The rotations pipeline: exploded per-stint rows <-> aggregated rotation
  * rows with a first-class array<struct> STINTS column
  * (reference: etl/rotations.py:10-14,49-68; SURVEY.md §2.4 A1, §2.8).
  *
  * The reference JSON-encodes the stint list only because Postgres rows
  * can't hold structs; we keep structs native and provide `stintsJson` for
  * sink parity. `collect_list` order is nondeterministic in a distributed
  * engine, so order is imposed with `sort_array` — equivalent to the
  * reference's insertion order because a player's stints are disjoint,
  * time-sorted intervals (SURVEY.md §7 risk register).
  */
object Stints {

  /** game_rotation-shaped rows -> one row per (GAME_ID, PLAYER_ID) with
    * sorted STINTS. One exchange on the 8-part group key; partial
    * aggregation is map-side combinable. */
  def aggregate(gameRotation: DataFrame): DataFrame =
    gameRotation
      .withColumn("SEASON", GameIds.extractSeason(col("GAME_ID")))
      .withColumn("SEASON_TYPE", GameIds.extractSeasonType(col("GAME_ID")))
      .withColumnRenamed("PERSON_ID", "PLAYER_ID")
      .groupBy(col("GAME_ID"), col("TEAM_ID"), col("TEAM_NAME"), col("PLAYER_ID"),
        col("PLAYER_FIRST"), col("PLAYER_LAST"), col("SEASON"), col("SEASON_TYPE"))
      .agg(sort_array(collect_list(struct(col("IN_TIME_REAL"), col("OUT_TIME_REAL"))))
        .as("STINTS"))
      .withColumn("id", GameIds.syntheticId(col("GAME_ID"), col("PLAYER_ID")))

  /** Inverse: aggregated rotations -> one row per stint (the shape of the
    * reference's golden game_rotation.csv, test.py:11-15). */
  def explodeStints(rotations: DataFrame): DataFrame =
    rotations
      .withColumn("stint", explode(col("STINTS")))
      .withColumn("IN_TIME_REAL", col("stint.IN_TIME_REAL"))
      .withColumn("OUT_TIME_REAL", col("stint.OUT_TIME_REAL"))
      .drop("stint", "STINTS")

  /** JSON text form of STINTS for sinks that can't hold structs
    * (reference: etl/rotations.py:13 encodes; play_by_play_with_players.py:16
    * decodes). */
  def stintsJson(rotations: DataFrame): DataFrame =
    rotations.withColumn("STINTS", to_json(col("STINTS")))

  /** Decode the JSON text form back to array<struct> (F7). */
  def stintsFromJson(rotations: DataFrame): DataFrame =
    rotations.withColumn("STINTS",
      from_json(col("STINTS"), graft.schema.Schemas.stints))
}
