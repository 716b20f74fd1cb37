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

  test("resizeImages touches only images; undecodable images fall back to the byte fake") {
    val resized = resizeImages(mediaDs, width = 2, height = 2)
      .collect().map(m => m.media_id -> m).toMap
    assert(resized(1L).bytes.length == 4) // not a real PNG -> 2x2 raw-raster fake
    // the fallback's meta must describe the fake raster, not the original
    assert(resized(1L).meta == MediaMeta(Some(2), Some(2), None, None, Some("raw")))
    assert(resized(2L).bytes.toSeq == Seq[Byte](10, 20, 30)) // untouched
    assert(resized(3L).bytes.length == 32)
  }

  /** A real PNG, generated in-memory: a w x h gradient with a bright
    * top-left quadrant. */
  private def png(w: Int, h: Int, bright: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val topLeft = x < w / 2 && y < h / 2
      val v = if (bright && topLeft) 255 else (x * 13 + y * 7) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real image decode: features come from pixels, not payload bytes") {
    // same gradient at two sizes -> different aspect/pixels; bright variant
    // must light up the top-left quadrant feature (index 0)
    val rows = Seq(
      MediaRow(10L, "image", png(8, 6), MediaMeta(Some(8), Some(6), None, None, Some("png"))),
      MediaRow(11L, "image", png(8, 6, bright = true), MediaMeta(Some(8), Some(6), None, None, Some("png"))))
      .toDS()
    val got = extractFeatures(rows.toDF()).collect().map(f => f.media_id -> f.features).toMap
    assert(got(10L).length == FakeCodec.FeatureDim)
    assert(math.abs(got(10L)(7) - 8f / 6f) < 1e-6, "feature 7 is the true aspect ratio")
    assert(got(11L)(0) > got(10L)(0), "bright top-left quadrant must raise feature 0")
    assert(got(11L)(3) == got(10L)(3), "untouched quadrant must match exactly")
    // decoding is deterministic
    val again = extractFeatures(rows.toDF()).collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(got.map { case (k, v) => k -> v.toSeq } == again)
  }

  private def wav(freq: Double, amp: Double, sr: Int = 8000, n: Int = 8000): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * freq * i / sr) * amp * 32767).toInt.toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real audio decode: features come from samples — envelope, pitch proxy, duration") {
    val rows = Seq(
      MediaRow(20L, "audio", wav(440, 0.9), MediaMeta(None, None, Some(8000), None, Some("wav"))),
      MediaRow(21L, "audio", wav(440, 0.1), MediaMeta(None, None, Some(8000), None, Some("wav"))),
      MediaRow(22L, "audio", wav(880, 0.9), MediaMeta(None, None, Some(8000), None, Some("wav"))),
      // not PCM at all -> deterministic byte-fake fallback
      MediaRow(23L, "audio", Array.tabulate(64)(_.toByte), MediaMeta(None, None, None, None, None)))
      .toDS()
    val got = extractFeatures(rows.toDF()).collect().map(f => f.media_id -> f.features).toMap
    // a 0.9-amplitude sine has RMS ~ 0.9/sqrt(2): the quarter-RMS envelope
    // must see it, and amplitude must separate loud from quiet
    assert(got(20L)(0) > 0.5 && got(20L)(3) > 0.5, got(20L).mkString(","))
    assert(got(21L)(0) < 0.2, "quiet clip must have low RMS")
    assert(got(20L)(4) > got(21L)(4), "peak separates loud from quiet")
    // doubling the frequency doubles the zero-crossing rate
    assert(math.abs(got(22L)(5) / got(20L)(5) - 2.0) < 0.05,
      s"zcr ratio: ${got(22L)(5)} / ${got(20L)(5)}")
    assert(math.abs(got(20L)(6) - 1.0f) < 1e-3, "1s clip duration")
    assert(got(23L).toSeq == FakeCodec.features(rows.collect()
      .find(_.media_id == 23L).get.bytes).toSeq, "undecodable audio falls back to the fake")
  }

  test("real image resize: output is a decodable PNG at the target geometry, meta updated") {
    val rows = Seq(
      MediaRow(20L, "image", png(8, 6), MediaMeta(Some(8), Some(6), None, None, Some("png")))).toDS()
    val out = resizeImages(rows, width = 4, height = 3).collect().head
    val back = Codec.decodeImage(out.bytes)
    assert(back.isDefined, "resized payload must re-decode")
    assert(back.get.getWidth == 4 && back.get.getHeight == 3)
    assert(out.meta.width.contains(4) && out.meta.height.contains(3))
    assert(out.meta.format.contains("png"))
    // nearest-neighbor on a solid quadrant is exact: resize of the bright
    // variant keeps its top-left corner pixel fully bright
    val b = resizeImages(Seq(MediaRow(21L, "image", png(8, 6, bright = true),
      MediaMeta(None, None, None, None, None))).toDS(), 4, 3).collect().head
    val img = Codec.decodeImage(b.bytes).get
    assert((img.getRGB(0, 0) & 0xffffff) == 0xffffff)
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
