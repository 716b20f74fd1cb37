package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2), one named query
  * per operator, each runnable over any `/root/testdata/sf*` directory.
  * `oracleSql` carries the DuckDB-equivalent ANSI SQL for the hash-compare
  * gate; queries without an entry get a rows-only check.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (EventOps.queries, EventOps.oracles),
      (TextOps.queries, TextOps.oracles),
      (DedupOps.queries, DedupOps.oracles),
      (VectorOps.queries, VectorOps.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(modules.map(_._1), "query")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    merged(modules.map(_._2), "oracle")

  /** Map ++ silently keeps only the LAST entry on a key collision — which
    * here would shrink the graded inventory (or pair a query with another
    * module's oracle) with no signal. Fail loudly instead. */
  private def merged[V](maps: Seq[Map[String, V]], what: String): Map[String, V] = {
    val m = maps.reduce(_ ++ _)
    require(m.size == maps.map(_.size).sum, {
      val dupes = maps.flatMap(_.keys).groupBy(identity).collect {
        case (k, ks) if ks.size > 1 => k
      }
      s"duplicate $what name(s) across modules: ${dupes.mkString(", ")}"
    })
    m
  }
}
