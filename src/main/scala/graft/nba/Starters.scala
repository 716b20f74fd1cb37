package graft.nba

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{GameClock, GameIds}

/** Period-starter derivation from play-by-play alone — the reference's
  * pbp fallback path (reference:
  * etl/players_on_court_at_start_of_period.py:90-122): a player who appears
  * in a period started it iff their first substitution event in the period
  * is a sub-OUT, or they have no substitution events at all.
  *
  * Relational formulation (SURVEY.md §2.5 W2): instead of the reference's
  * per-player loop, one window `row_number() == 1` over the unpivoted sub
  * events — a single shuffle on (GAME_ID, PERIOD, PLAYER_ID), scale-free.
  */
object Starters {

  /** pbp must carry GAME_ID, PERIOD, EVENTNUM, EVENTMSGTYPE, PCTIMESTRING,
    * PLAYER{1,2,3}_ID, PLAYER{1,2,3}_TEAM_ID. Returns
    * (id, GAME_ID, PERIOD, PLAYER_ID, TEAM_ID, SEASON, SEASON_TYPE).
    */
  def derive(pbp: DataFrame): DataFrame = {
    // players seen in the period: union of the three (id, team) slots,
    // team 0 / null dropped (reference :94-107)
    val players = Seq(1, 2, 3)
      .map { k =>
        pbp.select(col("GAME_ID"), col("PERIOD"),
          col(s"PLAYER${k}_ID").as("PLAYER_ID"),
          col(s"PLAYER${k}_TEAM_ID").as("TEAM_ID"))
      }
      .reduce(_ unionByName _)
      .filter(col("TEAM_ID").isNotNull && col("TEAM_ID") =!= 0 && col("PLAYER_ID").isNotNull)
      .distinct()

    // substitution events, unpivoted to one row per involved player;
    // at the same event the OUT row wins (reference :117-120 checks
    // PLAYER1_ID first), hence the is_out DESC tiebreak
    val subs = pbp
      .filter(col("EVENTMSGTYPE") === 8)
      .withColumn("SECONDS_FROM_START",
        GameClock.secondsFromStart(col("PERIOD"), col("PCTIMESTRING")))
    val subLong = Seq((1, 1), (2, 0))
      .map { case (k, isOut) =>
        subs.select(col("GAME_ID"), col("PERIOD"),
          col(s"PLAYER${k}_ID").as("PLAYER_ID"),
          col("SECONDS_FROM_START"), col("EVENTNUM"), lit(isOut).as("is_out"))
      }
      .reduce(_ unionByName _)
      .filter(col("PLAYER_ID").isNotNull)

    val w = Window
      .partitionBy(col("GAME_ID"), col("PERIOD"), col("PLAYER_ID"))
      .orderBy(col("SECONDS_FROM_START").asc, col("EVENTNUM").asc, col("is_out").desc)
    val firstSub = subLong
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("GAME_ID"), col("PERIOD"), col("PLAYER_ID"), col("is_out"))

    players
      .join(firstSub, Seq("GAME_ID", "PERIOD", "PLAYER_ID"), "left")
      .filter(col("is_out").isNull || col("is_out") === 1)
      .select(
        GameIds.syntheticId(col("GAME_ID"), col("PERIOD"), col("PLAYER_ID")).as("id"),
        col("GAME_ID"), col("PERIOD"), col("PLAYER_ID"), col("TEAM_ID"),
        GameIds.extractSeason(col("GAME_ID")).as("SEASON"),
        GameIds.extractSeasonType(col("GAME_ID")).as("SEASON_TYPE"))
  }

  /** The reference's 10-starters-per-period invariant (reference :135,146-161)
    * as a checking query: rows are the violating (GAME_ID, PERIOD)s. */
  def violations(starters: DataFrame): DataFrame =
    starters
      .groupBy(col("GAME_ID"), col("PERIOD"))
      .agg(count(lit(1)).as("n_starters"))
      .filter(col("n_starters") =!= 10)
}
