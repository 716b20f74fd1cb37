package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Shingles

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
    def shingled = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), Shingles.wordNGrams(col("w"), 3).as("sh"))

    time("warmup")(noop(shingled))
    val sh = shingled.persist()
    time("cache_fill")(noop(sh))

    // ---- q33 stages
    val p = sh.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("g"))
    time("q33_posting")(noop(p))
    val j = p.as("x").join(p.as("y"),
      col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
    time("q33_join_only")(noop(j))
    val agg = j.groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
    time("q33_join_agg")(noop(agg))
    val ph = sh.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("g0")).withColumn("g", xxhash64(col("g0"))).drop("g0")
    val jh = ph.as("x").join(ph.as("y"),
      col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
    val aggh = jh.groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
    time("q33_join_agg_hashed")(noop(aggh))

    // ---- q31 stages
    val sig = sh
      .withColumn("hs", Shingles.md5PerShingle(col("sh")))
      .select(col("doc_id") +: col("sh") +:
        (0 until 8).map(j => Shingles.minHashSlice(col("hs"), j).as(s"h$j")): _*)
    time("q31_signatures")(noop(sig.drop("sh")))
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("b"),
        concat((0 until 2).map(r => col(s"h${b * 2 + r}")): _*).as("v"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.v").as("v"))
    time("q31_bands")(noop(bands))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    time("q31_candidates")(noop(cand))
    val ver = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        Shingles.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
    time("q31_full")(noop(ver))

    // ---- q32 stages
    val gs = sh.select(col("doc_id"), explode(col("sh")).as("g"))
      .select(col("doc_id"), md5(col("g")).as("t"))
    time("q32_md5_postings")(noop(gs))
    val scoreCols = (0 until 32).map(i =>
      sum(when(substring(col("t"), i + 1, 1) >= "8", 1).otherwise(-1)).as(s"s$i"))
    val scored = gs.groupBy(col("doc_id")).agg(scoreCols.head, scoreCols.tail: _*)
    time("q32_scores")(noop(scored))
    val sim = scored.select(col("doc_id"),
      (0 until 32).map(i => when(col(s"s$i") > 0, 1L << i).otherwise(0L))
        .reduce(_ + _).cast("long").as("sh"))
    val bands2 = sim.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("b"),
          shiftright(col("sh"), 8 * b).bitwiseAND((1 << 8) - 1).as("v"))): _*))
        .as("band"))
      .select(col("doc_id"), col("sh"), col("band.b").as("b"), col("band.v").as("v"))
    val pairs = bands2.as("x").join(bands2.as("y"),
        col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
    time("q32_full")(noop(pairs))

    // ---- q32 variant A: bitwise scores (conv hex -> long, no per-bit substring)
    val gsv = sh.select(col("doc_id"), explode(col("sh")).as("g"))
      .select(col("doc_id") +: (0 until 4).map(k =>
        conv(substring(md5(col("g")), 8 * k + 1, 8), 16, 10).cast("long").as(s"v$k")): _*)
    val scoreColsA = (0 until 32).map { i =>
      val k = i / 8; val j = i % 8
      sum(shiftright(col(s"v$k"), 31 - 4 * j).bitwiseAND(1) * 2 - 1).as(s"s$i")
    }
    val scoredA = gsv.groupBy(col("doc_id")).agg(scoreColsA.head, scoreColsA.tail: _*)
    time("q32_scores_bitwise")(noop(scoredA))

    // ---- q32 variant B: packed 8 sums + count
    val packCols = (0 until 8).map { p =>
      val terms = (0 until 4).map { q =>
        val i = p * 4 + q; val k = i / 8; val j = i % 8
        shiftright(col(s"v$k"), 31 - 4 * j).bitwiseAND(1) * lit(1L << (16 * q))
      }
      sum(terms.reduce(_ + _)).as(s"p$p")
    }
    val scoredB = gsv.groupBy(col("doc_id"))
      .agg(packCols.head, (packCols.tail :+ count(lit(1)).as("n")): _*)
    time("q32_scores_packed")(noop(scoredB))

    // ---- q31 variant: hashed band value join
    val bandsH = bands.withColumn("vh", xxhash64(col("b"), col("v"))).drop("v")
    val candH = bandsH.as("x").join(bandsH.as("y"),
        col("x.vh") === col("y.vh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    time("q31_candidates_hashed")(noop(candH))

    // ---- q31 variant: signatures via posting groupBy-min (one md5/posting)
    val post31 = sh.select(col("doc_id"), explode(col("sh")).as("g"))
      .withColumn("t", md5(col("g")))
    val sigAgg = post31.groupBy(col("doc_id"))
      .agg(min(substring(col("t"), 1, 4)).as("h0"),
        (1 until 8).map(j => min(substring(col("t"), 4 * j + 1, 4)).as(s"h$j")): _*)
    time("q31_signatures_agg")(noop(sigAgg))
    val bandsAgg = sigAgg
      .select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), xxhash64(col("band.b"), col("band.v")).as("bv"))
    val candAgg = bandsAgg.as("x").join(bandsAgg.as("y"),
        col("x.bv") === col("y.bv") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val verAgg = candAgg
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        Shingles.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
    time("q31_full_agg")(noop(verAgg))

    sh.unpersist()
    spark.stop()
  }
}
