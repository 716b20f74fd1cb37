package graft.nba

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.schema.Stint

/** Full-DAG volume rehearsal of the flagship pipeline (the r16 verdict's
  * one blessed stretch): `PipelineMain.runWith` end-to-end over a
  * synthetic multi-season warehouse — three (SEASON, SEASON_TYPE) scopes
  * of 120 games each with quarantine games sprinkled in — exercising the
  * REAL fan-out the production DAG ships: arg-scoped read -> cogroup
  * state machine -> season-partition publish (write-audit-publish swaps)
  * -> quarantine replace. LineupsVolumeSpec pins the operator at volume;
  * this pins the WAREHOUSE PROTOCOL around it at volume:
  *
  *   1. three scopes publish into disjoint partition leaves of ONE
  *      warehouse, ids globally unique, one error row per bad game;
  *   2. a delta run appends exactly the unseen games and re-quarantines
  *      (replaces, never duplicates) the still-failing ones;
  *   3. a full-mode season rerun with changed input swaps ONLY that
  *      season's partitions — every file of the other season is
  *      untouched on disk (path+mtime identical), the reference's
  *      ON CONFLICT DO UPDATE scoped to the partitions it recomputes;
  *   4. a fixed game's quarantine row heals on the next full run while
  *      its rows appear in the output.
  *
  * The scale argument this rehearses for 100 TB: every step reads and
  * swaps O(affected partitions), never the warehouse — the semi-join
  * prune in Publish.idempotent and the per-leaf rename in
  * Warehouse.overwritePartitions are what stage 3 observes from the
  * filesystem. */
class PipelineVolumeSpec extends SparkSpec {
  import spark.implicits._

  private val T1 = 100L
  private val T2 = 200L
  private val nGames = 120

  /** One synthetic game: prefix encodes (season, type) via the game-id
    * contract (F3/F4); `bad` swaps in a sub of an absent player (the
    * quarantine trigger); `subOut` picks which starter leaves so the
    * final lineup is game-dependent (state-leak detector). */
  private case class Game(prefix: String, i: Int, bad: Boolean, subOut: Long) {
    def id: String = f"$prefix$i%05d"
  }

  private def games(prefix: String, idx: Range = 0 until nGames): Seq[Game] =
    idx.map(i => Game(prefix, i, bad = i % 40 == 39, subOut = i % 5 + 1))

  private def writeInput(dir: String, gs: Seq[Game]): Unit = {
    gs.flatMap { g =>
      (1L to 5L).map(p => (g.id, T1, p, Seq(Stint(0.0, 28800.0)))) ++
        Seq((g.id, T1, 6L, Seq(Stint(3600.0, 28800.0)))) ++
        (11L to 15L).map(p => (g.id, T2, p, Seq(Stint(0.0, 28800.0)))) ++
        Seq((g.id, T2, 16L, Seq(Stint(10800.0, 28800.0))))
    }.toDF("GAME_ID", "TEAM_ID", "PLAYER_ID", "STINTS")
      .write.mode("overwrite").parquet(s"$dir/rotations")
    gs.flatMap { g =>
      Seq(
        (g.id, 1L, 10, 0, 1, "12:00", Some(1L), Some(T1), Some(11L), Some(T2)),
        (g.id, 2L, 8, 0, 1, "6:00",
          Some(if (g.bad) 999L else g.subOut), Some(T1), Some(6L), Some(T1)),
        (g.id, 3L, 1, 0, 1, "2:00", Some(6L), Some(T1), None, None),
        (g.id, 4L, 8, 0, 2, "6:00", Some(12L), Some(T2), Some(16L), Some(T2)))
    }.toDF("GAME_ID", "EVENTNUM", "EVENTMSGTYPE", "EVENTMSGACTIONTYPE", "PERIOD",
      "PCTIMESTRING", "PLAYER1_ID", "PLAYER1_TEAM_ID", "PLAYER2_ID", "PLAYER2_TEAM_ID")
      .withColumn("PLAYER3_ID", lit(null).cast("long"))
      .withColumn("PLAYER3_TEAM_ID", lit(null).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/play_by_play")
  }

  private def run(in: String, out: String, season: String, tpe: String,
      delta: Boolean = false): Unit =
    PipelineMain.runWith(spark, PipelineArgs.parse(Seq(
      "--season", season, "--season-type", tpe,
      "--input", in, "--output", out) ++
      (if (delta) Seq("--delta") else Nil)).toOption.get)

  /** Every data file under `dir`, path -> mtime — the "did the swap touch
    * this partition?" witness. */
  private def snapshot(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir)).map(f => f.getPath -> f.lastModified).toMap
  }

  test(s"full-DAG rehearsal: 3 scopes x $nGames games — partition isolation, delta, surgical replace, quarantine heal") {
    val root = java.nio.file.Files.createTempDirectory("graft-volume").toString
    val in = s"$root/in"
    val out = s"$root/out"
    val outTbl = s"$out/play_by_play_with_players"
    val errTbl = s"$out/lineup_errors"
    val scopes = Seq( // (prefix, season, type) per the game-id contract
      ("00223", "2023-24", "Regular Season"),
      ("00224", "2024-25", "Regular Season"),
      ("00424", "2024-25", "Playoffs"))
    val all = scopes.flatMap { case (p, _, _) => games(p) }
    writeInput(in, all)

    // ---- stage 1: initial publish of all three scopes into one warehouse
    scopes.foreach { case (_, s, t) => run(in, out, s, t) }
    val goodPerScope = nGames - 3 // i = 39/79/119 quarantine
    // READER CONTRACT exercised throughout: a DataFrame handle snapshots
    // its file listing at creation, so every read below is created FRESH
    // after the publishes it observes — a pre-swap handle would (by
    // Spark semantics, not a warehouse bug) throw FAILED_READ_FILE once
    // the swap retires the files it listed
    def outDf = spark.read.parquet(outTbl)
    val n1 = outDf.count()
    assert(n1 == scopes.size * goodPerScope * 4L)
    assert(outDf.select("id").distinct().count() == n1,
      "ids globally unique across seasons")
    // the three scopes landed in three disjoint partition leaves
    val leaves = outDf.select("SEASON", "SEASON_TYPE").distinct()
      .as[(String, String)].collect().toSet
    assert(leaves == scopes.map { case (_, s, t) => (s, t) }.toSet)
    // per-game state stayed per-game at volume: spot the subOut dependence
    val finals = outDf.filter(col("EVENTNUM") === 4)
      .select("GAME_ID", "TEAM1_PLAYER1", "TEAM1_PLAYER2", "TEAM1_PLAYER3",
        "TEAM1_PLAYER4", "TEAM1_PLAYER5")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5, r._6)).toMap
    Seq(0, 57, 101).foreach { i =>
      scopes.foreach { case (p, _, _) =>
        val g = Game(p, i, bad = false, subOut = i % 5 + 1)
        assert(finals(g.id) == ((1L to 5L).toSet - g.subOut + 6L).toSeq.sorted,
          s"final lineup of ${g.id}")
      }
    }
    val errs1 = spark.read.parquet(errTbl).select("GAME_ID").as[String].collect()
    assert(errs1.length == 9 && errs1.toSet == all.filter(_.bad).map(_.id).toSet,
      "one quarantine row per bad game across all scopes")

    // ---- stage 2: the season grows; a delta run appends exactly the
    // unseen games and re-quarantines (replaces) the still-failing ones
    val grown = games("00224") ++ games("00224", 200 until 230)
    writeInput(in, scopes.filterNot(_._1 == "00224").flatMap {
      case (p, _, _) => games(p) } ++ grown)
    run(in, out, "2024-25", "Regular Season", delta = true)
    val n2 = outDf.count()
    assert(n2 == n1 + 30 * 4L, "delta appends only the unseen games")
    assert(outDf.select("id").distinct().count() == n2)
    val errs2 = spark.read.parquet(errTbl).select("GAME_ID").as[String].collect()
    assert(errs2.sorted.toSeq == errs1.sorted.toSeq,
      "still-failing games are re-quarantined by replace, never duplicated")

    // ---- stage 3: surgical full-mode replace of ONE season — the other
    // season's partition files must be untouched on disk
    val before = snapshot(s"$outTbl/SEASON=2024-25")
    assert(before.nonEmpty)
    val in3 = s"$root/in3"
    writeInput(in3, games("00223").map(g => if (g.i == 0) g.copy(subOut = 3L) else g))
    run(in3, out, "2023-24", "Regular Season")
    val n3 = outDf.count()
    assert(n3 == n2, "a replace run changes rows, not row counts")
    assert(outDf.select("id").distinct().count() == n3,
      "ON CONFLICT DO UPDATE: recomputed games replace, never duplicate")
    val g0 = outDf.filter(col("GAME_ID") === "0022300000" && col("EVENTNUM") === 4)
      .select("TEAM1_PLAYER1", "TEAM1_PLAYER2", "TEAM1_PLAYER3", "TEAM1_PLAYER4",
        "TEAM1_PLAYER5")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(Seq(g0._1, g0._2, g0._3, g0._4, g0._5) == Seq(1L, 2L, 4L, 5L, 6L),
      "the changed input is what the recomputed partition now holds")
    assert(snapshot(s"$outTbl/SEASON=2024-25") == before,
      "the untouched season's partition files survive byte-for-byte in place " +
        "(path+mtime) — only the recomputed season's leaves were swapped")

    // ---- stage 4: a fixed game heals out of the quarantine on the next
    // full run of its scope
    val in4 = s"$root/in4"
    writeInput(in4, grown.map(g => if (g.i == 39) g.copy(bad = false) else g))
    run(in4, out, "2024-25", "Regular Season")
    val errs4 = spark.read.parquet(errTbl).select("GAME_ID").as[String].collect()
    assert(errs4.length == 8 && !errs4.contains("0022400039"),
      "a healed game's quarantine row is gone")
    assert(outDf.filter(col("GAME_ID") === "0022400039").count() == 4,
      "and its rows are published")
    assert(outDf.count() == n3 + 4)
  }
}
