package graft.tools

import graft.{Sessions, SparkEntry}

/** Writes `.explain("formatted")` for named queries to files — the
  * before/after plan evidence the optimization rounds commit under
  * `plans/rNN/`. Usage:
  * `runMain graft.tools.DumpPlans <sfDir> <outDir> <suffix> <query>...`
  * emits `<outDir>/<query>_<suffix>.txt` per query. Plans are the
  * pre-execution shape (AQE initial plan), which is what the committed
  * plan-shape claims reference.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: DumpPlans <sfDir> <outDir> <suffix> <query>...")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    names.filterNot(SparkEntry.queries.contains) match {
      case Nil => ()
      case bad => sys.error(s"unknown queries: $bad")
    }
    val spark = Sessions.local("graft-dumpplans")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${name}_$suffix.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.write(plan) finally w.close()
      println(s"[dumpplans] wrote ${f.getPath} (${plan.length} chars)")
    }
    spark.stop()
  }
}
