package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import Multimodal._

/** The multimodal plumbing end-to-end on binary columns (codec stubbed —
  * the Spark-side schema/partitioning/batch shape is what's under test). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDs = Seq(
    MediaRow(1L, "image", Array[Byte](1, 2, 3, 4, 5, 6), MediaMeta(Some(2), Some(3), None, None, Some("png"))),
    MediaRow(2L, "audio", Array[Byte](10, 20, 30), MediaMeta(None, None, Some(16000), None, Some("wav"))),
    MediaRow(3L, "video", Array.tabulate[Byte](32)(_.toByte), MediaMeta(Some(4), Some(4), None, Some(8), Some("raw"))))
    .toDS()

  test("extractFeatures: fixed-dim deterministic features, payload pruned from output") {
    val feats = extractFeatures(mediaDs.toDF())
    val got = feats.collect().map(f => f.media_id -> f).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.forall(_.features.length == FakeCodec.FeatureDim))
    assert(got(1L).n_bytes == 6)
    // deterministic: same input -> same features
    val again = extractFeatures(mediaDs.toDF()).collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(got.map { case (k, v) => k -> v.features.toSeq } == again)
    // no binary column in the output schema (never shuffle payloads)
    assert(!feats.schema.fields.exists(_.dataType.typeName == "binary"))
  }

  test("resizeImages touches only images and enforces the target size") {
    val resized = resizeImages(mediaDs, targetBytes = 4).collect().map(m => m.media_id -> m).toMap
    assert(resized(1L).bytes.length == 4)
    assert(resized(2L).bytes.toSeq == Seq[Byte](10, 20, 30)) // untouched
    assert(resized(3L).bytes.length == 32)
  }

  test("sampleFrames: every stride-th fixed-size window of video payloads only") {
    val frames = sampleFrames(mediaDs, frameSize = 8, stride = 2).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    assert(frames.forall(_.media_id == 3L))
    assert(frames.length == 2) // windows 0,1,2,3 -> kept 0,2
    assert(frames(0).bytes.toSeq == (0 until 8).map(_.toByte))
    assert(frames(1).bytes.toSeq == (16 until 24).map(_.toByte))
  }

  test("similarMedia ranks a near-identical payload above a different one (the ANN bridge)") {
    // 1 and 4 share payload bytes (one appended byte); 5 is unrelated
    val media = Seq(
      MediaRow(1L, "image", Array[Byte](1, 2, 3, 4, 5, 6), MediaMeta(None, None, None, None, None)),
      MediaRow(4L, "image", Array[Byte](1, 2, 3, 4, 5, 6, 1), MediaMeta(None, None, None, None, None)),
      MediaRow(5L, "image", Array.tabulate[Byte](16)(i => (100 + i).toByte), MediaMeta(None, None, None, None, None)))
      .toDS()
    val got = similarMedia(media.toDF(), queryIds = Seq(1L), topK = 2)
      .select(col("neighbor_id"), col("rank")).as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(got.map(_._1) == Seq(4L, 5L), s"nearest neighbor of 1 must be its near-copy: $got")
    // payload bytes never cross a shuffle: no Exchange outputs a binary column
    import org.apache.spark.sql.execution.exchange.Exchange
    val plan = similarMedia(media.toDF(), Seq(1L), 2).queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.forall(_.output.forall(_.dataType.typeName != "binary")),
      exchanges.map(_.output.mkString(",")).mkString("; "))
  }

  test("media table round-trips through parquet with the declared schema") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    mediaDs.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    val kinds = back.select(col("kind")).as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }
}
