package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

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

    def nullOf(f: StructField): Column = lit(null).cast(f.dataType)

    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__tie", lit(null).cast(right.schema(rightTie).dataType))
    val withRightNulls = payloadCols.foldLeft(taggedLeft) { (d, c) =>
      d.withColumn(s"__p_$c", nullOf(right.schema(c)))
    }

    val taggedRightBase = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__tag", lit(0))
      .withColumn("__tie", col(rightTie))
    val taggedRight = payloadCols
      .foldLeft(taggedRightBase) { (d, c) => d.withColumn(s"__p_$c", col(c)) }
      .select(
        keyCols.map(col) ++ Seq(col("__ts"), col("__tag"), col("__tie")) ++
          payloadCols.map(c => col(s"__p_$c")) ++
          leftCols.filterNot(keyCols.contains).map(c => nullOf(left.schema(c)).as(c)): _*)

    val unioned = withRightNulls
      .select(
        keyCols.map(col) ++ Seq(col("__ts"), col("__tag"), col("__tie")) ++
          payloadCols.map(c => col(s"__p_$c")) ++
          leftCols.filterNot(keyCols.contains).map(col): _*)
      .unionByName(taggedRight)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = payloadCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"__asof_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }

    filled
      .filter(col("__tag") === 1)
      .select(
        leftCols.map(col) ++
          payloadCols.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }
}
