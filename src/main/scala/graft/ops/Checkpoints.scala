package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block management for iterative DataFrame loops built on
  * `localCheckpoint(eager = true)`.
  *
  * The physical blocks of a localCheckpoint'ed frame belong to the
  * UNDERLYING RDD (the Dataset's plan is a LogicalRDD over it):
  * `Dataset.unpersist` only clears SQL-cache entries and would free
  * nothing — an iterative loop must release the real RDDs or every
  * round's full result stays in memory simultaneously. Unpersisting a
  * locally-checkpointed RDD discards its data (the lineage is truncated),
  * which is safe exactly when nothing references that round anymore.
  */
object Checkpoints {
  /** The checkpoint-backing RDDs of a frame's analyzed plan. */
  def rddsOf(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }
}
