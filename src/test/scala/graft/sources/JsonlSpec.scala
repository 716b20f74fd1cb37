package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** JSONL source/sink: schema-locked parse, malformed-line AND
  * null-required-field quarantine (per-item isolation, not job death or
  * silent publish), and a lossless round trip. */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  test("clean lines parse; malformed and null-field lines land in quarantine") {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.write(Paths.get(s"$dir/crawl.jsonl"), java.util.List.of(
      """{"doc_id": 1, "source": "src0", "text": "a clean document"}""",
      """not json at all {{{""",
      """{"doc_id": 2, "source": "src1", "text": "another clean one"}""",
      """{"doc_id": 3, "source": "src0"}""",
      """{"doc_id": null, "source": "src1", "text": "null key"}"""))
    val (good, quarantine) = Jsonl.read(spark, dir, schema)
    val docs = good.as[(Long, String, String)].collect().sortBy(_._1)
    assert(docs.map(_._1).toSeq == Seq(1L, 2L))
    assert(docs.head._3 == "a clean document")
    // a valid-JSON line with a null required field is as unusable as a
    // malformed one: null text is invisible to every shingle-based gate
    // but would still publish — it must quarantine, not pass
    val bad = quarantine.collect()
    assert(bad.length == 3, s"expected 3 quarantined lines, got ${bad.toSeq}")
    assert(bad.forall(_.getString(1).contains("crawl.jsonl")),
      "quarantine must name the offending file")
    assert(bad.exists(_.getString(0).contains("not json at all")))
    assert(bad.exists(_.getString(0).contains(""""doc_id": 3""")))
  }

  test("quarantine _file provenance survives same-session cache substitution") {
    val dir = Files.createTempDirectory("jsonl_cached").toString
    Files.write(Paths.get(s"$dir/crawl.jsonl"), java.util.List.of(
      """{"doc_id": 1, "source": "src0", "text": "clean"}""",
      """not json at all {{{"""))
    // poison the session the way a long-lived ingest job would: some
    // other step has .cache()d a text read over the SAME dump path. The
    // cache manager substitutes any later scan over the dir with the
    // InMemoryRelation, where input_file_name() evaluates to "" — the
    // quarantine audit column would blank (the deleteWhere discovery
    // failure mode, r18; here it degrades an audit string, but a blank
    // file name in an erasure audit is still a wrong answer)
    val cached = spark.read.text(dir).cache()
    cached.count()
    try {
      val (good, quarantine) = Jsonl.read(spark, dir, schema)
      assert(good.count() == 1)
      val bad = quarantine.collect()
      assert(bad.length == 1 && bad.head.getString(1).contains("crawl.jsonl"),
        s"quarantine must name the offending file even with the dump " +
          s"cached; got '${bad.headOption.map(_.getString(1))}'")
    } finally cached.unpersist()
  }

  test("requiredNonNull relaxes per column; unknown columns rejected loudly") {
    val dir = Files.createTempDirectory("jsonl_opt").toString
    Files.write(Paths.get(s"$dir/crawl.jsonl"), java.util.List.of(
      """{"doc_id": 1, "text": "source-less line kept when source is optional"}"""))
    val (good, quarantine) =
      Jsonl.read(spark, dir, schema, Some(Seq("doc_id", "text")))
    assert(good.count() == 1 && quarantine.isEmpty)
    intercept[IllegalArgumentException] {
      Jsonl.read(spark, dir, schema, Some(Seq("nope")))
    }
  }

  test("write -> read round trip is lossless under the locked schema") {
    val dir = Files.createTempDirectory("jsonl_rt").toString
    val docs = Seq(
      (10L, "src0", "first body"), (11L, "src1", "second body"))
      .toDF("doc_id", "source", "text")
    Jsonl.write(docs, s"$dir/out")
    val (back, quarantine) = Jsonl.read(spark, s"$dir/out", schema)
    assert(back.as[(Long, String, String)].collect().toSet ==
      Set((10L, "src0", "first body"), (11L, "src1", "second body")))
    assert(quarantine.isEmpty)
  }

  test("lineIdIn is never null over arbitrary lines — the keep-side deleteWhere contract (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the contract under test: deleteWhere keeps rows via filter(!pred),
    // where a NULL predicate silently DELETES the unaddressable line it
    // must keep — so lineIdIn must evaluate to true/false on EVERY line,
    // garbage included
    val ids = Seq(7L, 13L)
    val gen: Gen[(String, Option[Boolean])] = Gen.oneOf(
      Gen.alphaNumStr.map(s => (s"garbage $s", Some(false))),
      Gen.choose(0L, 20L).map(i =>
        (s"""{"doc_id": $i, "text": "t"}""", Some(ids.contains(i)))),
      Gen.const(("""{"doc_id": null, "text": "t"}""", Some(false))),
      Gen.const(("""{"text": "no id field"}""", Some(false))),
      // type-mismatched id: engine-defined match value, but the
      // never-null property must still hold
      Gen.choose(0L, 20L).map(i => (s"""{"doc_id": "$i"}""", None)))
    val rows = Gen.listOfN(400, gen)
      .pureApply(Gen.Parameters.default, Seed(113L))
    val df = rows.map(_._1).toDF("line")
    val pred = Jsonl.lineIdIn(col("line"),
      Jsonl.idProjection("doc_id"), "doc_id", ids)
    val got = df.select(col("line"), pred.as("m"), pred.isNull.as("nul"))
      .collect()
    assert(got.forall(!_.getBoolean(2)),
      "the predicate must never evaluate to null")
    val expected = rows.toMap
    got.foreach { r =>
      expected(r.getString(0)).foreach(e =>
        assert(r.getBoolean(1) == e, s"line '${r.getString(0)}'"))
    }
    // the partition property deleteWhere's rewrite relies on
    assert(df.filter(pred).count() + df.filter(!pred).count() == df.count(),
      "filter(pred) + filter(!pred) must partition the lines")
  }

  test("a schema declaring the internal corrupt column is rejected loudly") {
    intercept[IllegalArgumentException] {
      Jsonl.read(spark, "/nonexistent", StructType(Seq(
        StructField("_graft_corrupt", StringType))))
    }
  }
}
