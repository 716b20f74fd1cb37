package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations (SURVEY.md "optimize for
  * scale"): explicit key salting for the cases AQE's runtime skew-join
  * handling can't reach (first-stage aggregations, deterministic plans,
  * skew known in advance — e.g. a superstar player id appearing in a large
  * fraction of events).
  *
  * Shape: the skewed (big) side gets a uniform random salt in [0, n); the
  * small side is replicated n times; the join key becomes (key, salt).
  * Row multiplicity is preserved exactly — each big-side row matches the
  * single replica carrying its salt.
  */
object Salting {

  /** Join types for which replica-per-salt is multiplicity-preserving: the
    * big (salted) side drives the result, so each of its rows meets exactly
    * one replica. Right/full-outer would emit every unmatched small-side
    * row once per replica — rejected rather than silently wrong. */
  private val LeftFlavored = Set(
    "inner", "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti")

  /** Uniform deterministic-enough salt in [0, n) for a big-side row. */
  private def saltCol(n: Int): org.apache.spark.sql.Column =
    pmod(spark_partition_id() + monotonically_increasing_id(), lit(n)).cast("int")

  /** Equi-join `big ⋈ small` on `keys`, salted `n` ways. `small` is
    * replicated n× (keep it the dimension side). Only inner/left-flavored
    * join types are accepted (see LeftFlavored). */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      n: Int,
      joinType: String = "inner"): DataFrame = {
    require(n > 0, "salt factor must be positive")
    require(LeftFlavored.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin is only correct for inner/left-flavored join types " +
        s"(unmatched small-side rows would appear once per salt replica); got '$joinType'")
    val salted = big.withColumn("__salt", saltCol(n))
    val replicated = small.withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase salted aggregation: partial aggregate on (key, salt), then
    * final aggregate on key. `partialAggs` must be decomposable (sum/count/
    * min/max); pass the matching `finalAggs` over the partial columns.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      n: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    require(n > 0 && partialAggs.nonEmpty && finalAggs.nonEmpty)
    val salted = df.withColumn("__salt", saltCol(n))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
