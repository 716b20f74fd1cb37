package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.sources.Tables
import graft.queries.DedupOps

/** Micro-profile of the components() round machinery: times each internal
  * stage in isolation on the real q38 pair set to localize the fixed
  * overhead seen at sf0.1 (13 s for one round over 256 pairs).
  */
object ProfComponents {
  import Prof.{time, noop}

  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val s = Sessions.local("prof-components")
    noop(Tables.documents(s, dir))

    val sh = DedupOps.shingledOf(Tables.documents(s, dir)).persist()
    noop(sh)
    val pp = DedupOps.minhashNearDup(sh).persist()
    time("pairs persist")(noop(pp))

    time("full components FIRST (bench order)")(
      println("[prof] rounds=" + DedupOps.componentsWithRounds(pp)._2))
    time("full components SECOND")(
      println("[prof] rounds=" + DedupOps.componentsWithRounds(pp)._2))

    val p = pp.select(col("doc_a"), col("doc_b")).persist()
    time("p persist+count")(p.count())

    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(col("src")).persist()
    time("edges persist+count")(edges.count())

    val labels0 = edges
      .groupBy(col("src").as("doc_id"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("doc_id"), least(col("doc_id"), col("nmin")).as("label"))
    time("labels0 count")(labels0.count())

    val l0 = time("labels0 localCheckpoint")(labels0.localCheckpoint(true))

    val nullOld = lit(null).cast("bigint").as("old")
    val viaNeighbors = edges
      .join(l0.withColumnRenamed("doc_id", "src"), Seq("src"))
      .select(col("dst").as("doc_id"), col("label"), nullOld)
    val obs = org.apache.spark.sql.Observation()
    val round = l0
      .select(col("doc_id"), col("label"), col("label").as("old"))
      .unionByName(viaNeighbors)
      .groupBy(col("doc_id"))
      .agg(min(col("label")).as("label"), max(col("old")).as("old"))
      .observe(obs, count(when(col("label") < col("old"), true)).as("changed"))
      .select(col("doc_id"), col("label"))
    time("round count (no ckpt)")(round.count())
    val r1 = time("round localCheckpoint")(round.localCheckpoint(true))
    time("obs.get")(println("[prof] changed=" + obs.get("changed")))
    time("round2 localCheckpoint")({
      val obs2 = org.apache.spark.sql.Observation()
      val viaN2 = edges
        .join(r1.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst").as("doc_id"), col("label"), nullOld)
      r1.select(col("doc_id"), col("label"), col("label").as("old"))
        .unionByName(viaN2)
        .groupBy(col("doc_id"))
        .agg(min(col("label")).as("label"), max(col("old")).as("old"))
        .observe(obs2, count(when(col("label") < col("old"), true)).as("changed"))
        .select(col("doc_id"), col("label"))
        .localCheckpoint(true)
      println("[prof] changed2=" + obs2.get("changed"))
    })
    time("full componentsWithRounds")(
      println("[prof] rounds=" + DedupOps.componentsWithRounds(pp)._2))
    s.stop()
  }
}
