package graft.nba

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** The one idempotent publish protocol every entry point shares
  * (the DataFrame rendering of the reference's `INSERT ... ON CONFLICT
  * (id) DO UPDATE`, database/db_client.py:69-92):
  *
  *   - delta mode: the rows are by construction absent from the target,
  *     so they plain-append (one write, no read of the target);
  *   - full mode: existing rows of the partitions this run recomputes are
  *     merged with the new rows (Upsert.replace on `key` — incoming wins),
  *     then exactly those partitions are swapped via write-audit-publish
  *     (Warehouse.overwritePartitions); the rest of the warehouse is
  *     never read or touched.
  */
object Publish {

  def idempotent(newRows: DataFrame, outDir: String, delta: Boolean,
      key: String = "id")(implicit spark: SparkSession): Unit = {
    if (delta)
      newRows.write.mode("append")
        .partitionBy(Warehouse.PartitionCols: _*).parquet(outDir)
    else {
      val merged = scala.util.Try(spark.read.parquet(outDir)).toOption match {
        case Some(ex) =>
          // merge only the partitions this run recomputes; the semi-join on
          // the partition columns prunes the rest of the warehouse
          val parts = newRows.select(Warehouse.PartitionCols.map(col): _*).distinct()
          val affected = ex.join(broadcast(parts), Warehouse.PartitionCols, "left_semi")
          Upsert.replace(affected, newRows, key)
        case None => newRows
      }
      Warehouse.overwritePartitions(merged, outDir)
    }
  }
}
