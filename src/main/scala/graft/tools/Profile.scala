package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the staged-shingle family: times each layer
  * of the q31 pipeline (scan -> shingle -> signature -> bands -> join)
  * separately so optimization effort lands where the time actually is.
  * Not part of any gate; run with
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.Profile"`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("graft-profile")
    import graft.queries.DedupOps
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // warm once, then best of 3 cold (cache cleared) runs
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label%-28s ${ts.min}%.3f s")
    }
    time("scan only")(docs.select(col("doc_id"), col("text")))
    time("split to words")(docs.select(col("doc_id"), split(col("text"), " ").as("w")))
    val sh = DedupOps.shingledOf(docs)
    time("shingledOf (ngrams)")(sh)
    time("+ minhashBandArr")(DedupOps.minhashBandArr(sh))
    time("q31 full")(DedupOps.minhashNearDup(sh))
    spark.stop()
  }
}
