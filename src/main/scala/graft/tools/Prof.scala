package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions
import graft.sources.Tables
import graft.queries.DedupOps

/** Stage-level profiling harness: times the pieces of the heaviest bench
  * queries in isolation against `SPARK_GRAFT_SF_DIR` so a regression can be
  * localized to a stage instead of a query. Not part of the library
  * surface; extend freely when hunting a new hot spot. This is where the
  * measured pitfalls documented around the codebase come from (generator-
  * child re-evaluation, HOF lambda re-inlining, per-round job overhead).
  */
object Prof {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val s = Sessions.local("prof")
    noop(Tables.documents(s, dir)) // warm codegen/classloading

    val docs = Tables.documents(s, dir)

    // q29 repetition signals: per-row form (the explode form measured 3.1s)
    time("q29: full")(noop(graft.queries.TextOps.repetitionSignals(docs)))
    time("q29: full again")(noop(graft.queries.TextOps.repetitionSignals(docs)))

    // q38 composition: shingles -> minhash pairs -> components rounds
    val sh = DedupOps.shingledOf(docs).persist()
    time("q38: shingles")(noop(sh))
    val pairs = DedupOps.minhashNearDup(sh)
    time("q38: minhash pairs (cold)")(noop(pairs))
    time("q38: minhash pairs (warm)")(noop(pairs))
    val pp = pairs.persist()
    noop(pp)
    val (labels, rounds) = time("q38: components on persisted pairs")(
      DedupOps.componentsWithRounds(pp))
    println(s"[prof] components: ${labels.count()} docs, $rounds rounds, " +
      s"${pp.count()} pairs")
    pp.unpersist()
    sh.unpersist()

    // q48 gate: uncached (stream-shaped) vs staged-shingle entry
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val even = docs.filter(col("doc_id") % 2 === 0)
    time("q48: gate from raw docs")(noop(DedupOps.nearDupAgainst(odd, even)))
    val shAll = DedupOps.shingledOf(docs).persist()
    noop(shAll)
    time("q48: gate from cached shingles")(noop(DedupOps.nearDupAgainstShingled(
      shAll.filter(col("doc_id") % 2 === 1),
      shAll.filter(col("doc_id") % 2 === 0))))
    shAll.unpersist()

    s.stop()
  }
}
