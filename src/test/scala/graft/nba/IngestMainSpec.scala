package graft.nba

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The ingest entry point end-to-end per table: enrichment, idempotent
  * rerun, delta semantics (reference etl/{play_by_play,rotations,
  * team_game_log,shot_details}.py). */
class IngestMainSpec extends SparkSpec {
  import spark.implicits._

  private val G = "0022400001"

  private def args(input: String, output: String, table: String, delta: Boolean = false) =
    PipelineArgs.Args(season = Some("2024-25"), seasonType = Some("Regular Season"),
      delta = delta, input = input, output = output, table = Some(table))

  test("play_by_play: stamps, dedups, publishes idempotently; delta appends nothing known") {
    val root = Files.createTempDirectory("graft_ing").toString
    // one duplicated event row (the reference full-row-dedups, :33)
    Seq((G, 1L, 1, "make"), (G, 1L, 1, "make"), (G, 2L, 8, "sub"))
      .toDF("GAME_ID", "EVENTNUM", "EVENTMSGTYPE", "DESC")
      .write.parquet(s"$root/in/play_by_play_raw")
    val a = args(s"$root/in", s"$root/out", "play_by_play")
    IngestMain.runWith(spark, a)
    val out = spark.read.parquet(s"$root/out/play_by_play")
    assert(out.count() == 2)
    assert(out.select("id").as[String].collect().toSet == Set(s"$G-1", s"$G-2"))
    assert(out.select("SEASON").distinct().as[String].head() == "2024-25")
    IngestMain.runWith(spark, a) // full rerun replaces
    assert(spark.read.parquet(s"$root/out/play_by_play").count() == 2)
    IngestMain.runWith(spark, a.copy(delta = true)) // delta: game already present
    assert(spark.read.parquet(s"$root/out/play_by_play").count() == 2)
  }

  test("rotations: aggregates raw stint rows into sorted STINTS per player") {
    val root = Files.createTempDirectory("graft_ing").toString
    Seq(
      (G, 100L, "Hornets", 7L, "A", "B", 8510.0, 9000.0),
      (G, 100L, "Hornets", 7L, "A", "B", 0.0, 5720.0),
      (G, 100L, "Hornets", 8L, "C", "D", 0.0, 28800.0))
      .toDF("GAME_ID", "TEAM_ID", "TEAM_NAME", "PERSON_ID",
        "PLAYER_FIRST", "PLAYER_LAST", "IN_TIME_REAL", "OUT_TIME_REAL")
      .write.parquet(s"$root/in/rotations_raw")
    IngestMain.runWith(spark, args(s"$root/in", s"$root/out", "rotations"))
    val out = spark.read.parquet(s"$root/out/rotations")
    assert(out.count() == 2)
    val p7 = out.filter(col("PLAYER_ID") === 7L)
      .select(col("STINTS").cast("array<struct<IN_TIME_REAL:double,OUT_TIME_REAL:double>>"))
      .as[Seq[(Double, Double)]].head()
    assert(p7 == Seq((0.0, 5720.0), (8510.0, 9000.0)), "stints must sort ascending")
  }

  test("team_game_log: id on (GAME_ID, TEAM_ID), season derived from the game id") {
    val root = Files.createTempDirectory("graft_ing").toString
    Seq((G, 100L, "CHA vs CLE"), (G, 200L, "CLE @ CHA"))
      .toDF("GAME_ID", "TEAM_ID", "MATCHUP")
      .write.parquet(s"$root/in/team_game_log_raw")
    IngestMain.runWith(spark, args(s"$root/in", s"$root/out", "team_game_log"))
    val out = spark.read.parquet(s"$root/out/team_game_log")
    assert(out.select("id").as[String].collect().toSet == Set(s"$G-100", s"$G-200"))
    assert(out.select("SEASON_TYPE").distinct().as[String].head() == "Regular Season")
  }

  test("shot_details: combo-keyed delta fetch unit, event-keyed ids") {
    val root = Files.createTempDirectory("graft_ing").toString
    def rawRows(rows: Seq[(Long, Long, String, Long)]) = rows
      .map { case (p, t, g, ev) => (p, t, g, ev, "2024-25", "Regular Season") }
      .toDF("PLAYER_ID", "TEAM_ID", "GAME_ID", "GAME_EVENT_ID", "SEASON", "SEASON_TYPE")
    rawRows(Seq((7L, 100L, G, 10L), (7L, 100L, G, 11L)))
      .write.parquet(s"$root/in/shot_details_raw")
    val a = args(s"$root/in", s"$root/out", "shot_details")
    IngestMain.runWith(spark, a)
    val out1 = spark.read.parquet(s"$root/out/shot_details")
    assert(out1.select("id").as[String].collect().toSet == Set(s"7-$G-10", s"7-$G-11"))
    // land one more combo; delta processes only the unseen (player, team) combo
    rawRows(Seq((7L, 100L, G, 10L), (7L, 100L, G, 11L), (8L, 100L, G, 12L)))
      .write.mode("overwrite").parquet(s"$root/in/shot_details_raw")
    IngestMain.runWith(spark, a.copy(delta = true))
    val out2 = spark.read.parquet(s"$root/out/shot_details")
    assert(out2.select("id").as[String].collect().toSet ==
      Set(s"7-$G-10", s"7-$G-11", s"8-$G-12"))
  }
}
