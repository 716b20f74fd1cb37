package graft.expressions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TextOps

/** The bounded-heap top-k aggregate: total-order semantics (ties to the
  * lower id), partitioning invariance (the whole point of a mergeable
  * O(k) buffer), null row skipping, and the aggregate — not window —
  * plan shape. */
class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(call_function("graft_topk", col("s"), col("i"), lit(k)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rk"),
        col("col.id").as("i"), col("col.score").as("s"))
      .as[(String, Int, Long, Double)]

  test("ranks by score desc, ties to the LOWER id, k bounds the group") {
    val df = Seq(
      ("a", 1L, 0.5), ("a", 2L, 0.9), ("a", 3L, 0.9), ("a", 4L, 0.1),
      ("g2", 9L, 0.7))
      .toDF("g", "i", "s")
    val got = topk(df, 2).collect().toSet
    assert(got == Set(
      ("a", 1, 2L, 0.9), // tie at 0.9: lower id first
      ("a", 2, 3L, 0.9),
      ("g2", 1, 9L, 0.7)), got.toString)
  }

  test("partitioning-invariant: 1 partition == 13 partitions == window form") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source").as("g"), col("doc_id").as("i"),
        (xxhash64(col("text")).cast("double") / 1e18).as("s"))
    val one = topk(df.repartition(1), 3).collect().toSet
    val many = topk(df.repartition(13), 3).collect().toSet
    assert(one == many, "a mergeable bounded buffer cannot depend on partitioning")
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("i").asc)
    val windowed = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("g"), col("rk"), col("i"), col("s"))
      .as[(String, Int, Long, Double)].collect().toSet
    assert(one == windowed, "heap and window forms must agree exactly")
  }

  test("null score or id rows are skipped, not ranked") {
    val df = Seq(
      ("a", Some(1L), Some(0.9)), ("a", None, Some(0.99)), ("a", Some(3L), None),
      ("a", Some(4L), Some(0.5)))
      .toDF("g", "i", "s")
    val got = topk(df, 5).collect().toSet
    assert(got == Set(("a", 1, 1L, 0.9), ("a", 2, 4L, 0.5)), got.toString)
  }

  test("plans as a two-phase object-hash AGGREGATE — no window, no group sort") {
    val df = Seq(("a", 1L, 0.5)).toDF("g", "i", "s")
    val plan = df.groupBy(col("g"))
      .agg(call_function("graft_topk", col("s"), col("i"), lit(3)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
    assert("partial_graft_topk|partial graft_topk".r.findFirstIn(plan).nonEmpty ||
      plan.contains("graft_topk"), plan)
  }

  test("k must be a positive literal") {
    val df = Seq(("a", 1L, 0.5)).toDF("g", "i", "s")
    val e = intercept[Exception] {
      df.groupBy(col("g"))
        .agg(call_function("graft_topk", col("s"), col("i"), lit(0)))
        .collect()
    }
    assert(e.getMessage.contains("k must be"), e.getMessage)
  }

  test("a foldable NULL k is a clean type-check failure, not an analysis NPE") {
    val df = Seq(("a", 1L, 0.5)).toDF("g", "i", "s")
    val e = intercept[Exception] {
      df.groupBy(col("g"))
        .agg(call_function("graft_topk", col("s"), col("i"),
          lit(null).cast("int")))
        .collect()
    }
    assert(e.getMessage.contains("non-null literal"), e.getMessage)
    assert(!e.isInstanceOf[NullPointerException], e.toString)
  }

  test("string ids rank with ties to the lexicographically LOWER id") {
    val df = Seq(
      ("a", "zebra", 0.9), ("a", "apple", 0.9), ("a", "mid", 0.5),
      ("a", "last", 0.1), ("g2", "only", 0.7))
      .toDF("g", "i", "s")
    val got = df.groupBy(col("g"))
      .agg(call_function("graft_topk", col("s"), col("i"), lit(2)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rk"),
        col("col.id").as("i"), col("col.score").as("s"))
      .as[(String, Int, String, Double)].collect().toSet
    assert(got == Set(
      ("a", 1, "apple", 0.9), // tie at 0.9: lower string first
      ("a", 2, "zebra", 0.9),
      ("g2", 1, "only", 0.7)), got.toString)
  }

  test("string-id buffers survive the partial-aggregate shuffle (partitioning-invariant)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("source AS g", "concat('d', doc_id) AS i",
        "CAST(xxhash64(text) AS DOUBLE) / 1e18 AS s")
    def run(parts: Int) = df.repartition(parts).groupBy(col("g"))
      .agg(call_function("graft_topk", col("s"), col("i"), lit(3)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.id"), col("col.score"))
      .as[(String, Int, String, Double)].collect().toSet
    assert(run(1) == run(13),
      "a serialized string-id buffer must merge identically under any partitioning")
  }

  test("any numeric score widens to double (int counts, float, decimal)") {
    val df = Seq(("a", 1L, 7), ("a", 2L, 9), ("a", 3L, 9)).toDF("g", "i", "n")
    def top(scoreCol: org.apache.spark.sql.Column) =
      df.groupBy(col("g"))
        .agg(call_function("graft_topk", scoreCol, col("i"), lit(2)).as("top"))
        .select(posexplode(col("top")))
        .select(col("col.id"), col("col.score"))
        .as[(Long, Double)].collect().toSet
    val expect = Set((2L, 9.0), (3L, 9.0))
    assert(top(col("n")) == expect)                      // int
    assert(top(col("n").cast("float")) == expect)        // float
    assert(top(col("n").cast("decimal(10,2)")) == expect) // decimal
  }

  test("an unsupported id type is a clean type-check failure") {
    val df = Seq(("a", 0.5, 0.9)).toDF("g", "i", "s")
    val e = intercept[Exception] {
      df.groupBy(col("g"))
        .agg(call_function("graft_topk", col("s"), col("i"), lit(2)))
        .collect()
    }
    assert(e.getMessage.contains("bigint|string"), e.getMessage)
  }

  test("q102's string-id heap agrees with the window form per source") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val heap = TextOps.topTermsPerSource(docs, 5)
      .as[(String, Int, String, Long)].collect().toSet
    val counts = docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("tf").desc, col("term").asc)
    val windowed = counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("source"), col("rk"), col("term"), col("tf"))
      .as[(String, Int, String, Long)].collect().toSet
    assert(heap == windowed)
  }

  test("q96's shape agrees with the q55-style window quota at the same k") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val heap = TextOps.topKPerSource(docs, 3)
      .as[(String, Int, Long, Double)].collect().toSet
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    val windowed = TextOps.qualityScore(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select(col("source"), col("doc_id"), col("quality"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("source"), col("rk"), col("doc_id"), col("quality"))
      .as[(String, Int, Long, Double)].collect().toSet
    assert(heap == windowed)
  }
}
