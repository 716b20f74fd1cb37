package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join: for each left row, attach the payload of the
  * latest right row with `right.ts <= left.ts` on the same key — the
  * point-in-interval lookup the reference does when resolving which stint
  * covers an event (reference: etl/play_by_play_with_players.py:100-111,
  * SURVEY.md §2.3 J6).
  *
  * Implementation is the union + running `last(_, ignoreNulls)` window
  * rewrite, NOT an inequality join: a theta join on `ts >= ts` explodes to
  * O(|left| x |right|) per key before filtering, while this plan is one
  * shuffle on the key and a single ordered scan per key — the only
  * formulation that survives 100 TB. Right rows sort before left rows at
  * equal timestamps (tag 0 < 1), so "at-or-before" semantics hold; among
  * equal-timestamp right rows the one with the greatest tiebreak wins.
  *
  * The payload travels as ONE struct column (null only on the interleaved
  * left rows), so a single `last(ignoreNulls)` always returns the whole
  * latest right ROW — per-column lasts would skip a legitimately-null
  * payload field and stitch the output from different right rows.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      rightTie: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payloadCols.forall(right.columns.contains), "payload must exist on right")

    val payloadType = StructType(payloadCols.map(c => right.schema(c)))
    def nullOf(dt: org.apache.spark.sql.types.DataType): Column = lit(null).cast(dt)

    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__tie", nullOf(right.schema(rightTie).dataType))
      .withColumn("__p", nullOf(payloadType))

    val taggedRight = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__tag", lit(0))
      .withColumn("__tie", col(rightTie))
      .withColumn("__p", struct(payloadCols.map(c => col(c).as(c)): _*))
      .select(
        keyCols.map(col) ++ Seq(col("__ts"), col("__tag"), col("__tie"), col("__p")) ++
          leftCols.filterNot(keyCols.contains).map(c => nullOf(left.schema(c).dataType).as(c)): _*)

    val unioned = taggedLeft
      .select(
        keyCols.map(col) ++ Seq(col("__ts"), col("__tag"), col("__tie"), col("__p")) ++
          leftCols.filterNot(keyCols.contains).map(col): _*)
      .unionByName(taggedRight)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(
        leftCols.map(col) ++
          payloadCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }
}
