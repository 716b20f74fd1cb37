package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{GameClock, GameIds}

/** SURVEY §5(3): property-based coverage of the scalar functions. Inputs
  * are ScalaCheck-generated (fixed seed — reproducible); each property is
  * evaluated over all cases in ONE DataFrame pass rather than one Spark
  * job per case. */
class GameFunctionsPropSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int = 300): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  test("F1 clock: seconds-from-start equals the period model for all (period, remaining)") {
    val gen = for {
      period <- Gen.choose(1, 8)
      len = if (period <= 4) 720 else 300
      remaining <- Gen.choose(0, len)
    } yield (period, remaining)
    val rows = cases(gen).map { case (p, rem) =>
      (p, f"${rem / 60}%d:${rem % 60}%02d", rem)
    }
    val got = rows.toDF("PERIOD", "PCTIMESTRING", "rem")
      .select(col("PERIOD"), col("rem"),
        GameClock.secondsFromStart(col("PERIOD"), col("PCTIMESTRING")).as("sfs"),
        GameClock.periodStartTenths(col("PERIOD")).as("start10"),
        GameClock.periodEndTenths(col("PERIOD")).as("end10"))
      .as[(Int, Int, Int, Double, Double)].collect()
    got.foreach { case (p, rem, sfs, start10, end10) =>
      val len = if (p <= 4) 720 else 300
      val expected = start10 / 10 + (len - rem)
      assert(sfs == expected, s"period $p remaining $rem")
      // F2 bounds: the event time lies inside its period's tenth-bounds
      assert(start10 <= sfs * 10 && sfs * 10 <= end10, s"period $p remaining $rem")
    }
  }

  test("F3/F4 round-trip: parsing a constructed game id recovers (year, type)") {
    val gen = for {
      yy <- Gen.choose(0, 99)
      typ <- Gen.oneOf(1, 2, 4)
      tail <- Gen.choose(0, 99999)
    } yield (yy, typ, tail)
    val rows = cases(gen).map { case (yy, typ, tail) =>
      (f"00$typ%d$yy%02d$tail%05d", yy, typ)
    }
    val got = rows.toDF("GAME_ID", "yy", "typ")
      .select(col("yy"), col("typ"),
        GameIds.extractSeason(col("GAME_ID")).as("season"),
        GameIds.extractSeasonType(col("GAME_ID")).as("stype"))
      .as[(Int, Int, String, String)].collect()
    got.foreach { case (yy, typ, season, stype) =>
      assert(season == f"${2000 + yy}%d-${(yy + 1) % 100}%02d", s"yy=$yy")
      val expectedType = typ match {
        case 1 => "Pre Season"; case 2 => "Regular Season"; case 4 => "Playoffs"
      }
      assert(stype == expectedType, s"typ=$typ")
    }
  }

  test("F5 synthetic id: null sentinel keeps rows with shifted nulls distinct") {
    val gen = Gen.listOfN(3, Gen.option(Gen.choose(0L, 9L)))
    val rows = cases(gen, 400).map(l => (l(0), l(1), l(2)))
    val got = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        GameIds.syntheticId(col("a"), col("b"), col("c")).as("id"))
      .as[(Option[Long], Option[Long], Option[Long], String)].collect()
    got.foreach { case (a, b, c, id) =>
      val expected = Seq(a, b, c)
        .map(_.map(_.toString).getOrElse("None")).mkString("-")
      assert(id == expected, s"($a,$b,$c)")
    }
    // injectivity over the rendered key: distinct triples -> distinct ids
    val byId = got.groupBy(_._4).values
    assert(byId.forall(g => g.map(r => (r._1, r._2, r._3)).distinct.size == 1),
      "two distinct key triples collided on one id")
  }
}
