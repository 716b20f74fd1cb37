package graft.nba

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Starter derivation semantics (etl/players_on_court_at_start_of_period.py:90-122):
  * starter iff no sub event in the period, or the first one is a sub-OUT. */
class StartersSpec extends SparkSpec {
  import spark.implicits._

  // pbp columns: GAME_ID, PERIOD, EVENTNUM, EVENTMSGTYPE, PCTIMESTRING,
  // PLAYER1_ID, PLAYER1_TEAM_ID, PLAYER2_ID, PLAYER2_TEAM_ID, PLAYER3_ID, PLAYER3_TEAM_ID
  private type Row = (String, Int, Long, Int, String, Option[Long], Option[Long], Option[Long], Option[Long], Option[Long], Option[Long])
  private def pbpOf(rows: Seq[Row]) =
    rows.toDF("GAME_ID", "PERIOD", "EVENTNUM", "EVENTMSGTYPE", "PCTIMESTRING",
      "PLAYER1_ID", "PLAYER1_TEAM_ID", "PLAYER2_ID", "PLAYER2_TEAM_ID",
      "PLAYER3_ID", "PLAYER3_TEAM_ID")

  private val G = "0022400001"
  private val T1 = 100L

  test("no-sub player is a starter; first-OUT is a starter; first-IN is not") {
    val pbp = pbpOf(Seq[Row](
      // p1 scores (appears, no subs) -> starter
      (G, 1, 1L, 1, "11:00", Some(1L), Some(T1), None, None, None, None),
      // p2 subbed OUT for p3 at 10:00 -> p2 starter, p3 not (first event is IN)
      (G, 1, 2L, 8, "10:00", Some(2L), Some(T1), Some(3L), Some(T1), None, None),
      // p3 later subbed OUT again -> still not a starter (first event was IN)
      (G, 1, 3L, 8, "05:00", Some(3L), Some(T1), Some(2L), Some(T1), None, None),
      // team 0 slot is dropped (reference :105)
      (G, 1, 4L, 1, "04:00", Some(9L), Some(0L), None, None, None, None)))
    val got = Starters.derive(pbp)
      .select(col("PLAYER_ID")).as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("same-event tiebreak: player both OUT and IN at the first event counts as OUT (reference :117-120)") {
    val pbp = pbpOf(Seq[Row](
      (G, 1, 1L, 8, "10:00", Some(5L), Some(T1), Some(5L), Some(T1), None, None)))
    val got = Starters.derive(pbp).select(col("PLAYER_ID")).as[Long].collect().toSet
    assert(got == Set(5L))
  }

  test("periods are independent: sub-IN in p1 can still start p2") {
    val pbp = pbpOf(Seq[Row](
      (G, 1, 1L, 8, "10:00", Some(2L), Some(T1), Some(3L), Some(T1), None, None),
      (G, 2, 10L, 1, "11:00", Some(3L), Some(T1), None, None, None, None)))
    val p2Starters = Starters.derive(pbp)
      .filter(col("PERIOD") === 2).select(col("PLAYER_ID")).as[Long].collect().toSet
    assert(p2Starters == Set(3L))
  }

  test("violations flags periods without exactly 10 starters (reference :146-161)") {
    val pbp = pbpOf(Seq[Row](
      (G, 1, 1L, 1, "11:00", Some(1L), Some(T1), None, None, None, None)))
    val v = Starters.violations(Starters.derive(pbp))
      .select(col("PERIOD"), col("n_starters")).as[(Int, Long)].collect().toSeq
    assert(v == Seq((1, 1L)))
  }

  private val T2 = 200L
  private def boxOf(rows: Seq[(String, Int, Long, Long, Option[Double])]) =
    rows.toDF("GAME_ID", "PERIOD", "PLAYER_ID", "TEAM_ID", "MIN")

  /** Both teams' full five in the period-sliced box score, no subs. */
  private def fullBox(period: Int = 1) =
    boxOf((1L to 5L).map(p => (G, period, p, T1, Some(1.0))) ++
      (11L to 15L).map(p => (G, period, p, T2, Some(1.0))))

  test("primary box path: non-null-MIN candidates, first-sub-decides (reference :42-58,:73-88)") {
    val pbp = pbpOf(Seq[Row](
      // p1 subbed OUT for p6 -> p1 starter, p6 not; everyone else no-sub
      (G, 1, 1L, 8, "10:00", Some(1L), Some(T1), Some(6L), Some(T1), None, None)))
    val box = boxOf(
      (1L to 5L).map(p => (G, 1, p, T1, Some(1.0))) ++
        Seq((G, 1, 6L, T1, Some(0.5)), (G, 1, 7L, T1, None)) ++ // 6 sub-IN, 7 DNP
        (11L to 15L).map(p => (G, 1, p, T2, Some(1.0))))
    val got = Starters.deriveFromBox(pbp, box)
      .select(col("PLAYER_ID")).as[Long].collect().toSet
    assert(got == (1L to 5L).toSet ++ (11L to 15L).toSet)
  }

  test("combined derive prefers the primary path when it yields 10, else pbp fallback (reference :125-161)") {
    val pbp = pbpOf(Seq[Row](
      (G, 1, 1L, 1, "11:00", Some(1L), Some(T1), None, None, None, None),
      // period 2: box is missing -> fallback derives from pbp slots
      (G, 2, 10L, 1, "11:00", Some(99L), Some(T1), None, None, None, None)))
    val got = Starters.derive(pbp, fullBox())
    val p1 = got.filter(col("PERIOD") === 1).select(col("PLAYER_ID")).as[Long].collect().toSet
    val p2 = got.filter(col("PERIOD") === 2).select(col("PLAYER_ID")).as[Long].collect().toSet
    assert(p1 == (1L to 5L).toSet ++ (11L to 15L).toSet, "period 1 must come from the box score")
    assert(p2 == Set(99L), "period 2 must fall back to pbp (and is a violation, not silently dropped)")
  }

  test("box rows for a period absent from the pbp never emit starters (dirty fetch)") {
    val pbp = pbpOf(Seq[Row](
      (G, 1, 1L, 1, "11:00", Some(1L), Some(T1), None, None, None, None)))
    // dirty box data: a period-5 slice for a game whose pbp ends at period 1
    val box = fullBox().unionByName(fullBox(period = 5))
    val got = Starters.derive(pbp, box, strict = true)
    assert(got.select(col("PERIOD")).distinct().as[Int].collect().toSeq == Seq(1),
      "phantom period 5 must not surface")
    assert(Starters.deriveFromBox(pbp, box)
      .filter(col("PERIOD") === 5).count() == 0)
  }

  test("strict derive passes when every pbp period has exactly 10 starters") {
    val pbp = pbpOf(Seq[Row](
      (G, 1, 1L, 1, "11:00", Some(1L), Some(T1), None, None, None, None)))
    val got = Starters.derive(pbp, fullBox(), strict = true)
    assert(got.count() == 10)
  }

  test("strict derive fails at action time when a period lacks 10 starters (reference raises, :159-161)") {
    val pbp = pbpOf(Seq[Row](
      (G, 1, 1L, 1, "11:00", Some(1L), Some(T1), None, None, None, None)))
    val box = fullBox().filter(col("PLAYER_ID") =!= 15L) // primary yields 9 -> fallback yields 1
    val e = intercept[Exception] { Starters.derive(pbp, box, strict = true).count() }
    assert(messages(e).exists(_.contains("starters invariant violated")), messages(e).mkString("|"))
  }

  test("strict derive catches a period that produced ZERO starters (invisible to plain violations)") {
    val pbp = pbpOf(Seq[Row](
      (G, 1, 1L, 1, "11:00", Some(1L), Some(T1), None, None, None, None),
      // period 2 exists in pbp but every slot is team-0 -> no candidates at all
      (G, 2, 10L, 1, "11:00", Some(9L), Some(0L), None, None, None, None)))
    val e = intercept[Exception] { Starters.derive(pbp, fullBox(), strict = true).count() }
    assert(messages(e).exists(m => m.contains("starters invariant violated") && m.contains("has 0")),
      messages(e).mkString("|"))
  }

  test("id/SEASON/SEASON_TYPE stamped like the reference writer (:190-195)") {
    val pbp = pbpOf(Seq[Row](
      (G, 1, 1L, 1, "11:00", Some(1L), Some(T1), None, None, None, None)))
    val row = Starters.derive(pbp)
      .select(col("id"), col("SEASON"), col("SEASON_TYPE")).as[(String, String, String)].head()
    assert(row == ((s"$G-1-1", "2024-25", "Regular Season")))
  }
}
