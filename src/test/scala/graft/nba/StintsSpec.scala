package graft.nba

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The rotations pipeline on a game_rotation-shaped fixture, including the
  * reference quirks FIXTURES.md documents: null stats columns and rows with
  * OUT_TIME_REAL < IN_TIME_REAL (game_rotation.csv:61-65) — operators must
  * pass them through untouched. */
class StintsSpec extends SparkSpec {
  import spark.implicits._

  // (GAME_ID, TEAM_ID, TEAM_CITY, TEAM_NAME, PERSON_ID, first, last, in, out, pts)
  private def fixture = Seq(
    ("0022400236", 1610612766L, "Charlotte", "Hornets", 101L, "A", "One", 3600.0, 7200.0, Some(4.0)),
    ("0022400236", 1610612766L, "Charlotte", "Hornets", 101L, "A", "One", 0.0, 3600.0, Some(2.0)),
    ("0022400236", 1610612766L, "Charlotte", "Hornets", 102L, "B", "Two", 0.0, 28800.0, None),
    // reference quirk: inverted interval, kept verbatim
    ("0022400236", 1610612739L, "Cleveland", "Cavaliers", 201L, "C", "Three", 9000.0, 5000.0, None))
    .toDF("GAME_ID", "TEAM_ID", "TEAM_CITY", "TEAM_NAME", "PERSON_ID",
      "PLAYER_FIRST", "PLAYER_LAST", "IN_TIME_REAL", "OUT_TIME_REAL", "PLAYER_PTS")

  test("aggregate groups to one row per player with time-sorted stints (etl/rotations.py:49-63)") {
    val rot = Stints.aggregate(fixture)
    assert(rot.count() == 3)
    val p101 = rot.filter(col("PLAYER_ID") === 101L)
      .select(col("STINTS")).as[Seq[(Double, Double)]].head()
    // input order was (3600,7200),(0,3600); sort_array imposes time order
    assert(p101 == Seq((0.0, 3600.0), (3600.0, 7200.0)))
    val meta = rot.filter(col("PLAYER_ID") === 101L)
      .select(col("id"), col("SEASON"), col("SEASON_TYPE")).as[(String, String, String)].head()
    assert(meta == (("0022400236-101", "2024-25", "Regular Season")))
  }

  test("explodeStints inverts aggregate (row multiset preserved, quirks intact)") {
    val back = Stints.explodeStints(Stints.aggregate(fixture))
    assert(back.count() == 4)
    // the inverted interval survives untouched
    val inv = back.filter(col("PLAYER_ID") === 201L)
      .select(col("IN_TIME_REAL"), col("OUT_TIME_REAL")).as[(Double, Double)].head()
    assert(inv == ((9000.0, 5000.0)))
  }

  test("STINTS JSON round-trip (F6/F7: etl/rotations.py:13 / play_by_play_with_players.py:16)") {
    val rot = Stints.aggregate(fixture)
    val json = Stints.stintsJson(rot)
    assert(json.schema("STINTS").dataType.typeName == "string")
    val sample = json.filter(col("PLAYER_ID") === 101L).select(col("STINTS")).as[String].head()
    assert(sample == """[{"IN_TIME_REAL":0.0,"OUT_TIME_REAL":3600.0},{"IN_TIME_REAL":3600.0,"OUT_TIME_REAL":7200.0}]""")
    val decoded = Stints.stintsFromJson(json)
    val p101 = decoded.filter(col("PLAYER_ID") === 101L)
      .select(col("STINTS")).as[Seq[(Double, Double)]].head()
    assert(p101 == Seq((0.0, 3600.0), (3600.0, 7200.0)))
  }
}
