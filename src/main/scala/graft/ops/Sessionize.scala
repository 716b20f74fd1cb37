package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch analog of the reference's stint
  * model (a player's stints are sessions of on-court time; reference:
  * etl/rotations.py:10-14, SURVEY.md §2.9/§2.10).
  *
  * Scale notes: one shuffle on the key column; both window functions share
  * the same (partition, order) spec so Catalyst plans a single Exchange +
  * Sort. At 100 TB the per-key event counts stay small (bounded by user
  * activity), so no skew handling is needed beyond AQE.
  */
object Sessionize {

  /** Tag each row with a per-key `session_no` (1-based, increasing in time
    * order). A new session starts when the gap to the previous event
    * exceeds `gapSeconds`. Gap arithmetic uses whole epoch seconds
    * (`floor`), which is engine-portable: floor(b) - floor(a) counts
    * integer-second boundaries crossed, matching DuckDB's
    * `date_diff('second', a, b)`.
    */
  def withSessionNo(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(
      prev.isNull || (col(tsCol).cast("long") - prev.cast("long")) > gapSeconds, 1
    ).otherwise(0)
    df.withColumn(
      "session_no",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Collapse to one row per session: key, session_no, start/end timestamps
    * and event count. Extra aggregates can be appended by the caller via
    * `extraAggs`.
    */
  def sessions(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long,
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val base = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events"))
    withSessionNo(df, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_no"))
      .agg(base.head, (base.tail ++ extraAggs): _*)
  }
}
