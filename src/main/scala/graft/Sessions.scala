package graft

import org.apache.spark.sql.SparkSession

/** Session factory shared by Verify/Bench/tests.
  *
  * local-mode defaults sized for the harness (local[32], 128 GiB JVM):
  * shuffle partitions match core count, AQE on so skewed/small shuffles
  * re-plan at runtime — the same settings that scale to a real cluster,
  * where `spark.sql.shuffle.partitions` would be set to ~2-3x total cores
  * and AQE coalesces the rest.
  */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def local(appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      // events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects outright; read it as Long nanos and convert in the
      // loader (Tables.events) — Spark timestamps are micros anyway.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
