package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Game-id parsing and synthetic-key helpers as pure `Column` expressions
  * (SURVEY.md §2.7 F3/F4/F5).
  *
  * `GAME_ID` is a zero-padded string, e.g. "0022400061": character 3
  * (1-indexed) encodes the season type and characters 4-5 the season start
  * year (reference: utils/utils.py:66-79). It must never be cast to a
  * numeric type — leading zeros are semantic.
  */
object GameIds {

  /** F3: "0022400061" -> "2024-25" (reference: utils/utils.py:66-69).
    *
    * Intentional divergence from the reference: its
    * `'20{}-{}'.format(int(yy), yy+1)` drops the zero-pad, yielding
    * "205-6" for 2005-06 and "2099-100" for a 2099 season. We keep the
    * well-formed "2005-06" / "2099-00" rendering — the reference output is
    * a formatting bug, and every season the reference's README exercises
    * (2010-11+) renders identically in both.
    */
  def extractSeason(gameId: Column): Column = {
    val yy = substring(gameId, 4, 2).cast("int") // chars [3:5) zero-based
    val startYear = yy + 2000
    val endYY = (yy + 1) % 100
    format_string("%d-%02d", startYear, endYY)
  }

  /** F4: char 3 -> season type (reference: utils/utils.py:72-79). */
  def extractSeasonType(gameId: Column): Column =
    when(substring(gameId, 3, 1) === "1", "Pre Season")
      .when(substring(gameId, 3, 1) === "2", "Regular Season")
      .when(substring(gameId, 3, 1) === "4", "Playoffs")
      .otherwise(lit(null).cast("string"))

  /** Driver-side twin of [[extractSeason]], for request-scope decisions
    * made before any DataFrame exists (the fetch front). Same rendering. */
  def seasonOfId(gameId: String): String = {
    val yy = gameId.substring(3, 5).toInt
    f"${yy + 2000}%d-${(yy + 1) % 100}%02d"
  }

  /** Driver-side twin of [[extractSeasonType]]; null for unknown codes. */
  def seasonTypeOfId(gameId: String): String = gameId.charAt(2) match {
    case '1' => "Pre Season"
    case '2' => "Regular Season"
    case '4' => "Playoffs"
    case _ => null
  }

  /** F5: synthetic primary key = dash-joined natural-key columns cast to
    * string (reference: utils/utils.py:57-60).
    *
    * Each column is coalesced to the sentinel "None" before joining:
    * `concat_ws` alone silently skips nulls, which would collide ids for
    * rows differing only in which key column is null — e.g. (1,null,2) and
    * (1,2,null) both become "1-2". The reference's pandas astype(str)
    * renders nulls as "None", so the sentinel also matches its semantics.
    */
  def syntheticId(cols: Column*): Column =
    concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit("None"))): _*)

  /** P12: the reference's null normalization — numeric NaN/null -> 0.0,
    * other columns untouched (reference: utils/utils.py:28-37; applied at
    * etl/play_by_play.py:33, etl/rotations.py:67, etl/team_game_log.py:30).
    */
  def fillNulls(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val numericCols = df.schema.fields.collect {
      case StructField(name, _: NumericType, _, _) => name
    }
    val noNan = df.schema.fields.collect {
      case StructField(name, DoubleType | FloatType, _, _) => name
    }.foldLeft(df)((d, c) => d.withColumn(c, nanvl(col(c), lit(0.0))))
    noNan.na.fill(0.0, numericCols)
  }
}
