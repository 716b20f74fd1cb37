package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.queries.DedupOps

/** Measures the cost curve of `spanDedup`'s cleaning rewrite on the
  * pathological row: ONE fully-covered document at growing token length
  * (1x / 10x / 100x of a 4k-token base). The rewrite is per-row, so the
  * honest signal is wall time versus length on a single doc: the
  * array_except form should grow ~linearly (each step ~10x), where the
  * old filter/array_contains lambda grew ~quadratically (each step
  * ~100x — the 100x row alone would be ~10^11 comparisons and does not
  * finish). Evidence behind SCALING.md's q82 row; not part of the
  * library surface.
  *
  * Usage: sbt 'runMain graft.tools.ProfSpan'
  */
object ProfSpan {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("prof-span")
    import spark.implicits._
    val baseTokens = 4000
    def fullyCovered(tokens: Int): String =
      Seq.fill(tokens / 8)("p1 p2 p3 p4 p5 p6 p7 p8").mkString(" ")
    for (mult <- Seq(1, 10, 100)) {
      val doc = Seq((1L, fullyCovered(baseTokens * mult)))
        .toDF("doc_id", "text")
      val q = DedupOps.spanDedup(doc)
      q.write.format("noop").mode("overwrite").save() // warm codegen
      val t0 = System.nanoTime()
      q.write.format("noop").mode("overwrite").save()
      println(f"[profspan] tokens=${baseTokens * mult}%8d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    // Isolate the REWRITE expressions head-to-head on a fully-covered
    // token array (cov = every position), no join machinery: the old
    // filter/array_contains lambda versus the array_except form.
    for (mult <- Seq(1, 10)) {
      val tokens = baseTokens * mult
      val base = Seq((1L, fullyCovered(tokens))).toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .withColumn("cov", sequence(lit(1), size(col("w"))))
      def time(label: String, clean: org.apache.spark.sql.Column): Unit = {
        val q = base.select(length(array_join(clean, " ")).as("n"))
        q.write.format("noop").mode("overwrite").save()
        val t0 = System.nanoTime()
        q.write.format("noop").mode("overwrite").save()
        println(f"[profspan] rewrite=$label%-13s tokens=$tokens%8d " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%6.2fs")
      }
      time("contains-scan",
        filter(col("w"), (_, i) => !array_contains(col("cov"), i + 1)))
      time("array-except",
        transform(array_except(sequence(lit(1), size(col("w"))), col("cov")),
          i => element_at(col("w"), i)))
    }
    spark.stop()
  }
}
