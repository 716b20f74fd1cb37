package graft.tools

import org.apache.spark.sql.functions._

/** Dev profiling harness (see git history for variants). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("prof")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime
      val r = f
      println(f"PROF $name: ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tok = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
    val sh = tok.select(col("doc_id"),
      array_distinct(transform(sequence(lit(1), size(col("w")) - 2), i =>
        concat(element_at(col("w"), i), lit(" "),
          element_at(col("w"), i + 1), lit(" "),
          element_at(col("w"), i + 2)))).as("sh"))

    time("warm")(noop(sh))
    time("posting_full")(noop(sh.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("g"))))
    time("posting_no_n")(noop(sh.select(col("doc_id"), explode(col("sh")).as("g"))))
    val cached = sh.persist()
    time("cache_fill")(noop(cached))
    time("posting_cached")(noop(cached.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("g"))))
    val p = cached.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("g"))
    val j = p.as("x").join(p.as("y"), col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
    time("join_cached")(noop(j))
    val agg = j.groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
    time("agg_cached")(noop(agg))
    cached.unpersist()
    spark.stop()
  }
}
