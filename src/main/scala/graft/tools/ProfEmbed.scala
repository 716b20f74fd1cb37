package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.queries.DedupOps

/** Stage timing for q53 (embedding corpus dedup): kernel vs components. */
object ProfEmbed {
  import Prof.{time, noop}

  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val s = Sessions.local("prof-embed")
    noop(graft.sources.Tables.embeddings(s, dir))
    val q34 = graft.SparkEntry.queries("q34_cosine_neardup")
    time("q34 pairs (cold)")(noop(q34(s, dir)))
    time("q34 pairs (warm)")(noop(q34(s, dir)))
    val pairs = q34(s, dir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")).persist()
    println(s"[prof] pairs: ${pairs.count()}")
    val (labels, rounds) =
      time("components on persisted pairs")(DedupOps.componentsWithRounds(pairs))
    println(s"[prof] ${labels.count()} docs, $rounds rounds")
    val (labels2, rounds2) = time("components + pointer jumping")(
      DedupOps.componentsWithRounds(pairs, pointerJumping = true))
    println(s"[prof] ${labels2.count()} docs, $rounds2 rounds (jumping)")
    val (labels3, cycles) = time("componentsStar")(
      DedupOps.componentsStarWithRounds(pairs))
    println(s"[prof] ${labels3.count()} docs, $cycles cycles (star)")
    val q53 = graft.SparkEntry.queries("q53_embed_dedup")
    time("q53 full (cold-ish)")(noop(q53(s, dir)))
    time("q53 full (warm)")(noop(q53(s, dir)))
    s.stop()
  }
}
