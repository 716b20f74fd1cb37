package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Algebraic materialized-view maintenance: apply a keyed CDC delta to a
  * per-key (count, sum) aggregate WITHOUT rescanning the base facts — the
  * consumer side of `Warehouse.snapshotDiff`'s producer, and the classic
  * incremental-view-maintenance algebra (inserts add, deletes subtract,
  * updates contribute their difference) that works for any aggregate with
  * an abelian-group structure (count, sum, and anything derived from them;
  * NOT min/max, whose deletes need the base data back).
  *
  * At 100 TB the point is the asymptotics: refreshing a per-key rollup
  * over a slowly-changing fact estate costs O(|delta| + |MV|) — one
  * map-side-combinable aggregation of the delta plus one keyed merge with
  * the at-rest MV, exchange-free when the MV is bucketed on its key
  * (`Warehouse.writeBucketed`, the same co-location contract as
  * snapshotDiff) — instead of the O(|facts|) rescan the batch aggregate
  * pays. Correctness relies on exact addition: integer counts always, and
  * DECIMAL (never double) value sums, because `sum(base) + sum(delta) =
  * sum(all)` holds bit-exactly in decimal under ANY grouping or order.
  */
object IncrementalAgg {

  /** Merge a CDC delta into a per-key (count, sum) materialized view.
    *
    * `mv` carries `keyCols`, `countCol` (long) and `sumCol` (decimal).
    * `cdc` carries `op` ('insert' | 'delete' | 'update'), `keyCols`, and
    * `old_value` / `new_value` (decimal; old for delete/update, new for
    * insert/update — the before/after image of the aggregated value).
    * Any other `op` string fails the job loudly (`raise_error`) rather
    * than silently corrupting the view.
    *
    * A key whose maintained count reaches 0 leaves the view (its group no
    * longer exists); a NEGATIVE maintained count is corruption evidence
    * (a delete for a row the view never aggregated) and is deliberately
    * KEPT in the output so the mismatch is visible to the caller instead
    * of being filtered into silence. */
  def maintain(mv: DataFrame, cdc: DataFrame, keyCols: Seq[String],
      countCol: String = "n_rows", sumCol: String = "sum_value"): DataFrame = {
    require(keyCols.nonEmpty, "maintain needs at least one key column")
    val op = col("op")
    val dCount: Column =
      when(op === "insert", 1L).when(op === "delete", -1L)
        .when(op === "update", 0L)
        .otherwise(raise_error(concat(lit("unknown CDC op: "), op)))
    val dSum: Column =
      when(op === "insert", col("new_value"))
        .when(op === "delete", -col("old_value"))
        .otherwise(col("new_value") - col("old_value"))
    val delta = cdc.groupBy(keyCols.map(col): _*)
      .agg(sum(dCount).as("_d_count"), sum(dSum).as("_d_sum"))
    // full outer on the key list: Spark coalesces the USING columns, so
    // MV-only keys pass through and delta-only (new) keys enter the view
    mv.join(delta, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col(countCol), lit(0L)) + coalesce(col("_d_count"), lit(0L)))
          .as(countCol),
        (coalesce(col(sumCol), lit(0).cast("decimal(18,4)")) +
          coalesce(col("_d_sum"), lit(0).cast("decimal(18,4)"))).as(sumCol)): _*)
      .filter(col(countCol) =!= 0)
  }

  private val AppliedMarker = "_applied_batch"

  /** Continuous aggregation: the `foreachBatch` fold that maintains an
    * at-rest MV parquet from a CDC micro-batch stream — wire it as
    * `cdcStream.writeStream.foreachBatch(IncrementalAgg.maintainAggBatch(
    * mvDir, keys))`. Each micro-batch applies [[maintain]] against the
    * current MV and publishes the result with the crash-safe directory
    * swap; `_applied_batch` (an underscore file — invisible to parquet
    * readers, and swapped atomically WITH the data it describes) records
    * the last applied batch id, so a replayed micro-batch after a restart
    * is skipped instead of double-applied: exactly-once, the same
    * batch-dir-swap discipline as CorpusStreamMain. A crash between the
    * maintain and the swap leaves the old MV + old marker — the replay
    * re-applies cleanly.
    *
    * Scale: per trigger this costs O(|batch| + |MV|) — the continuous
    * form of the same asymptotics, with the MV read fresh from disk each
    * batch (nothing MV-sized held in executor memory between triggers). */
  def maintainAggBatch(mvDir: String, keyCols: Seq[String],
      countCol: String = "n_rows", sumCol: String = "sum_value")(
      batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    graft.sources.Warehouse.recover(spark, mvDir)
    val dir = new org.apache.hadoop.fs.Path(mvDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, AppliedMarker)
    val applied: Long =
      if (!fs.exists(marker)) -1L
      else {
        val in = fs.open(marker)
        try new String(in.readAllBytes(), "UTF-8").trim.toLong finally in.close()
      }
    if (batchId <= applied) return // replayed micro-batch: already folded
    val mv =
      if (fs.exists(dir)) spark.read.parquet(mvDir)
      else batch.select(keyCols.map(col): _*).limit(0)
        .withColumn(countCol, lit(0L))
        .withColumn(sumCol, lit(0).cast("decimal(38,4)"))
    val next = maintain(mv, batch.toDF(), keyCols, countCol, sumCol)
      .withColumn(sumCol, col(sumCol).cast("decimal(38,4)"))
    graft.sources.Warehouse.replaceDirWith(spark, mvDir) { staging =>
      next.write.parquet(staging)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(staging, AppliedMarker), true)
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    }
  }
}
