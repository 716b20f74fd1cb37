package graft.nba

import org.apache.spark.sql.functions._

/** CLI entry points mirroring the reference scripts' argument contract
  * (reference: utils/arg_parser.py:1-34 and the XOR validation every etl
  * script repeats, e.g. etl/play_by_play_with_players.py:198-203):
  * either --game-id, or both --season and --season-type, never both;
  * --delta restricts work to unseen games.
  */
object PipelineArgs {

  final case class Args(
      season: Option[String] = None,
      seasonType: Option[String] = None,
      gameId: Option[String] = None,
      delta: Boolean = false,
      input: String = "",
      output: String = "")

  def parse(argv: Seq[String]): Either[String, Args] = {
    def loop(rest: List[String], acc: Args): Either[String, Args] = rest match {
      case Nil => Right(acc)
      case "--season" :: v :: t => loop(t, acc.copy(season = Some(v)))
      case "--season-type" :: v :: t => loop(t, acc.copy(seasonType = Some(v)))
      case "--game-id" :: v :: t => loop(t, acc.copy(gameId = Some(v)))
      case "--delta" :: t => loop(t, acc.copy(delta = true))
      case "--input" :: v :: t => loop(t, acc.copy(input = v))
      case "--output" :: v :: t => loop(t, acc.copy(output = v))
      case other :: _ => Left(s"unknown argument: $other")
    }
    loop(argv.toList, Args()).flatMap(validate)
  }

  /** The reference's XOR rule, verbatim semantics. */
  def validate(a: Args): Either[String, Args] = {
    val hasGameId = a.gameId.isDefined
    val hasSeasonAndType = a.season.isDefined && a.seasonType.isDefined
    if (hasGameId && hasSeasonAndType)
      Left("You must provide either --game-id or both --season and --season-type, but not both.")
    else if (!hasGameId && !hasSeasonAndType)
      Left("You must provide either --game-id or both --season and --season-type.")
    else if (a.input.isEmpty || a.output.isEmpty)
      Left("--input and --output are required.")
    else Right(a)
  }
}

/** The flagship job as a runnable main: read play_by_play + rotations
  * (+ optional players_on_court, team_game_log) parquet from --input,
  * track lineups, write partitioned parquet + a quarantine table to
  * --output. Delta mode anti-joins the existing output's game ids
  * (reference: etl/play_by_play_with_players.py:167-176).
  */
object PipelineMain {

  def main(argv: Array[String]): Unit =
    PipelineArgs.parse(argv.toSeq) match {
      case Left(err) =>
        System.err.println(err)
        sys.exit(2)
      case Right(args) => run(args)
    }

  private def run(args: PipelineArgs.Args): Unit = {
    implicit val spark = graft.Sessions.local("graft-lineups")
    import graft.functions.GameIds

    def tbl(name: String) = spark.read.parquet(s"${args.input}/$name")

    val pbpAll = tbl("play_by_play")
    val scoped = args.gameId match {
      case Some(g) => pbpAll.filter(col("GAME_ID") === g)
      case None => pbpAll.filter(
        GameIds.extractSeason(col("GAME_ID")) === args.season.get &&
        GameIds.extractSeasonType(col("GAME_ID")) === args.seasonType.get)
    }
    val pbp =
      if (!args.delta) scoped
      else scala.util.Try(spark.read.parquet(s"${args.output}/play_by_play_with_players"))
        .toOption match {
        case Some(existing) =>
          Upsert.deltaNew(existing.select(col("GAME_ID")), scoped, Seq("GAME_ID"))
        case None => scoped
      }

    val starters = scala.util.Try(tbl("players_on_court_at_start_of_period")).toOption
    val teamLog = scala.util.Try(tbl("team_game_log")).toOption
    val (rows, errors) = Lineups.withPlayersAndErrors(
      pbp, tbl("rotations"), starters, teamLog)

    rows.toDF()
      .withColumn("SEASON", GameIds.extractSeason(col("GAME_ID")))
      .withColumn("SEASON_TYPE", GameIds.extractSeasonType(col("GAME_ID")))
      .write.mode("append")
      .partitionBy(graft.sources.Warehouse.PartitionCols: _*)
      .parquet(s"${args.output}/play_by_play_with_players")
    errors.toDF().write.mode("append")
      .parquet(s"${args.output}/lineup_errors")
    spark.stop()
  }
}
