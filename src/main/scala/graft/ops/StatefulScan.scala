package graft.ops

import org.apache.spark.sql.{Column, Dataset, Encoder}

/** Per-key ordered stateful scan — the execution pattern behind the
  * reference's flagship lineup-tracking operator (reference:
  * etl/play_by_play_with_players.py:113-165, SURVEY.md §2.9): events of one
  * key processed in time order by an imperative state machine.
  *
  * Uses the secondary-sort idiom — `repartition(key)` +
  * `sortWithinPartitions(key, order...)` + `mapPartitions` — rather than
  * `groupByKey.flatMapGroups`, because flatMapGroups does NOT guarantee any
  * intra-group order, which would force a per-group in-memory sort inside
  * the lambda (and OOM on a hot key). Here the shuffle writes ordered runs
  * and the scan is streaming: one shuffle, O(1) state per key, no
  * per-group materialization — the shape that holds at 100 TB.
  *
  * The caller's `f` sees each partition's rows sorted by (key, order) and
  * must detect key changes itself (keys never straddle partitions).
  */
object StatefulScan {

  def scanPartitions[T, U: Encoder](
      ds: Dataset[T],
      partitionExprs: Seq[Column],
      sortCols: Seq[Column])(
      f: Iterator[T] => Iterator[U]): Dataset[U] =
    ds.repartition(partitionExprs: _*)
      .sortWithinPartitions(sortCols: _*)
      .mapPartitions(f)
}
