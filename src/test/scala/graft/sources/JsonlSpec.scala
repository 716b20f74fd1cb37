package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** JSONL source/sink: schema-locked parse, malformed-line quarantine
  * (per-item isolation, not job death), and a lossless round trip. */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  test("clean lines parse; malformed lines land in quarantine with their file") {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.write(Paths.get(s"$dir/crawl.jsonl"), java.util.List.of(
      """{"doc_id": 1, "source": "src0", "text": "a clean document"}""",
      """not json at all {{{""",
      """{"doc_id": 2, "source": "src1", "text": "another clean one"}""",
      """{"doc_id": "NaN-ish", "source": 7}"""))
    val (good, quarantine, release) = Jsonl.read(spark, dir, schema)
    try {
      val docs = good.as[(Long, String, String)].collect().sortBy(_._1)
      assert(docs.map(_._1).toSeq == Seq(1L, 2L))
      assert(docs.head._3 == "a clean document")
      val bad = quarantine.collect()
      assert(bad.length == 2, "both malformed lines quarantined")
      assert(bad.forall(_.getString(1).contains("crawl.jsonl")),
        "quarantine must name the offending file")
      assert(bad.exists(_.getString(0).contains("not json at all")))
    } finally release()
  }

  test("write -> read round trip is lossless under the locked schema") {
    val dir = Files.createTempDirectory("jsonl_rt").toString
    val docs = Seq(
      (10L, "src0", "first body"), (11L, "src1", "second body"))
      .toDF("doc_id", "source", "text")
    Jsonl.write(docs, s"$dir/out")
    val (back, quarantine, release) = Jsonl.read(spark, s"$dir/out", schema)
    try {
      assert(back.as[(Long, String, String)].collect().toSet ==
        Set((10L, "src0", "first body"), (11L, "src1", "second body")))
      assert(quarantine.isEmpty)
    } finally release()
  }

  test("a schema declaring the internal corrupt column is rejected loudly") {
    intercept[IllegalArgumentException] {
      Jsonl.read(spark, "/nonexistent", StructType(Seq(
        StructField("_graft_corrupt", StringType))))
    }
  }
}
