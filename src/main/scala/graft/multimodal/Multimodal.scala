package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing here is real — schema, partition-parallel
  * batched execution via `mapPartitions` over typed rows (the Scala analog
  * of a Pandas-batch UDF: one JVM-side loop per partition, no per-row
  * serialization), deterministic outputs, tests. The IMAGE codec is real
  * too: decode/features/resize run on actual pixels via `javax.imageio`
  * (in the JDK — no new dependency). Audio/video codecs are not in the
  * JDK and stay STUBBED behind [[FakeCodec]]; swapping a real decoder in
  * changes one object — every signature, column and batch shape stays.
  *
  * Scale notes: media bytes dominate row size, so (a) feature extraction
  * prunes to (id, bytes) before the scan — never carry payloads through a
  * shuffle; (b) outputs are fixed-width vectors/structs, so downstream
  * joins/aggregations shuffle only features; (c) per-partition batching
  * amortizes any model/codec init in the same place a Pandas-batch UDF
  * would.
  */
object Multimodal {

  /** One media document: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("format", StringType))))))

  case class MediaMeta(width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], n_frames: Option[Int], format: Option[String])
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      features: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, bytes: Array[Byte])

  /** The codec boundary. Images and PCM audio take REAL paths — both ship
    * with the JDK (`javax.imageio` for PNG/JPEG/BMP/GIF, `javax.sound
    * .sampled` for WAV/AIFF/AU PCM) — so decode and feature extraction
    * need no external library. Video (and compressed audio) stays behind
    * [[FakeCodec]]: those codecs genuinely are not in the JDK, and the
    * deterministic fake keeps the pipeline around them fully testable;
    * swapping a real decoder in changes only this object. */
  object Codec {
    import java.awt.image.BufferedImage

    val FeatureDim: Int = FakeCodec.FeatureDim

    /** None when the payload is not a decodable image (ImageIO returns
      * null for unknown formats and throws on truncated streams — both
      * fold to None so the caller can fall back deterministically). */
    def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
      scala.util.Try(Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))).toOption.flatten

    /** 8-dim image signature from real pixels: quadrant mean luminance
      * (4), mean R/G/B (3), aspect ratio (1) — a deterministic stand-in
      * for a model embedding with actual geometric content. */
    def imageFeatures(img: BufferedImage): Array[Float] = {
      val w = img.getWidth
      val h = img.getHeight
      val lum = new Array[Double](4)
      val n = new Array[Long](4)
      var sr = 0.0; var sg = 0.0; var sb = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
          lum(q) += (r + g + b) / (3.0 * 255.0)
          n(q) += 1
          sr += r; sg += g; sb += b
          x += 1
        }
        y += 1
      }
      val total = w.toLong * h * 255.0
      Array(
        (if (n(0) > 0) lum(0) / n(0) else 0.0).toFloat,
        (if (n(1) > 0) lum(1) / n(1) else 0.0).toFloat,
        (if (n(2) > 0) lum(2) / n(2) else 0.0).toFloat,
        (if (n(3) > 0) lum(3) / n(3) else 0.0).toFloat,
        (sr / total).toFloat, (sg / total).toFloat, (sb / total).toFloat,
        w.toFloat / h.toFloat)
    }

    /** None when the payload is not decodable 16-bit PCM (WAV/AIFF/AU).
      * Channels are mono-folded; samples normalized to [-1, 1]. */
    def decodeAudio(bytes: Array[Byte]): Option[(Float, Array[Double])] =
      scala.util.Try {
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16, s"not 16-bit PCM: $fmt")
          val raw = ais.readAllBytes()
          val ch = fmt.getChannels
          val be = fmt.isBigEndian
          val n = raw.length / 2 / ch
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val off = (i * ch + c) * 2
              val lo = raw(off + (if (be) 1 else 0)) & 0xff
              val hi = raw(off + (if (be) 0 else 1)).toInt
              acc += ((hi << 8) | lo).toShort / 32768.0
              c += 1
            }
            out(i) = acc / ch
            i += 1
          }
          (fmt.getSampleRate, out)
        } finally ais.close()
      }.toOption

    /** 8-dim audio signature from real samples: RMS per quarter of the
      * clip (4 — the temporal envelope), peak amplitude, zero-crossing
      * rate (a crude pitch/noisiness proxy), duration in seconds, and
      * sample rate normalized to 48 kHz. */
    def audioFeatures(sampleRate: Float, samples: Array[Double]): Array[Float] = {
      val n = samples.length
      val rms = new Array[Double](4)
      val cnt = new Array[Long](4)
      var peak = 0.0
      var crossings = 0L
      var i = 0
      while (i < n) {
        val s = samples(i)
        val q = math.min(3, (i.toLong * 4 / math.max(1, n)).toInt)
        rms(q) += s * s
        cnt(q) += 1
        if (math.abs(s) > peak) peak = math.abs(s)
        if (i > 0 && (s >= 0) != (samples(i - 1) >= 0)) crossings += 1
        i += 1
      }
      Array(
        (if (cnt(0) > 0) math.sqrt(rms(0) / cnt(0)) else 0.0).toFloat,
        (if (cnt(1) > 0) math.sqrt(rms(1) / cnt(1)) else 0.0).toFloat,
        (if (cnt(2) > 0) math.sqrt(rms(2) / cnt(2)) else 0.0).toFloat,
        (if (cnt(3) > 0) math.sqrt(rms(3) / cnt(3)) else 0.0).toFloat,
        peak.toFloat,
        (if (n > 1) crossings.toDouble / (n - 1) else 0.0).toFloat,
        (if (sampleRate > 0) n / sampleRate else 0.0f),
        sampleRate / 48000.0f)
    }

    /** Kind-routed features: decodable images through the real pixel path,
      * decodable PCM audio through the real sample path, everything else
      * (video, compressed/undecodable payloads) through the fake. */
    def features(kind: String, bytes: Array[Byte]): Array[Float] =
      kind match {
        case "image" => decodeImage(bytes).map(imageFeatures)
          .getOrElse(FakeCodec.features(bytes))
        case "audio" => decodeAudio(bytes)
          .map { case (sr, samples) => audioFeatures(sr, samples) }
          .getOrElse(FakeCodec.features(bytes))
        case _ => FakeCodec.features(bytes)
      }

    /** Real raster resize: nearest-neighbor (deterministic across JVMs —
      * bilinear kernels may differ), re-encoded as PNG (lossless, in the
      * JDK). None when the payload is not a decodable image. */
    def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      decodeImage(bytes).map { img =>
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
  }

  /** The stubbed half of the codec boundary: deterministic fakes for the
    * modalities whose codecs are NOT in the JDK (audio, video) and for
    * payloads that fail the real image decode. */
  object FakeCodec {
    val FeatureDim = 8

    /** "Decode + feature-extract": deterministic 8-dim signature derived
      * from the payload bytes — stands in for a model embedding. */
    def features(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        acc(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      acc
    }

    /** "Resize": truncate/pad the payload to `target` bytes — stands in
      * for a real raster resize, preserving the contract (fixed output
      * size, same metadata shape). */
    def resize(bytes: Array[Byte], target: Int): Array[Byte] =
      java.util.Arrays.copyOf(bytes, target)

    /** "Frame-sample": every `stride`-th window of the payload — stands in
      * for video frame extraction. */
    def sampleFrames(bytes: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
      bytes.grouped(frameSize).zipWithIndex
        .collect { case (b, i) if i % stride == 0 => b }.toSeq
  }

  /** Feature extraction: partition-parallel batched map; prunes payload
    * columns immediately after use. */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("bytes")).as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // codec/model init would happen once per partition, here
        it.map { case (id, kind, bytes) =>
          MediaFeatures(id, kind, bytes.length, Codec.features(kind, bytes))
        }
      }
  }

  /** Media similarity — the bridge from multimodal ingest to the
    * similarity-search suite (queries.VectorOps): extracted features are
    * fixed-width vectors, so after extraction the payload bytes never
    * reach a join or shuffle; the query side broadcasts and the corpus
    * side streams, exactly like the brute-force top-k baseline (q35). At
    * scale the same features feed the IVF path (q36) unchanged. */
  def similarMedia(media: DataFrame, queryIds: Seq[Long], topK: Int)(
      implicit spark: SparkSession): DataFrame = {
    import graft.ops.VectorSim
    // nrm > 0: a degenerate (empty/zero) payload has an all-zero feature
    // vector whose cosine is NaN, and Spark SQL sorts NaN above every real
    // similarity — without the guard such media would rank first in every
    // query's top-k
    def featsOf(df: DataFrame) = extractFeatures(df).toDF()
      .select(col("media_id"), VectorSim.toDouble(col("features")).as("e"))
      .withColumn("nrm", VectorSim.norm(col("e")))
      .filter(col("nrm") > 0)
    val feats = featsOf(media)
    // filter BEFORE extraction: mapPartitions is an optimizer barrier, so
    // an id filter above it would decode the whole corpus a second time
    // just to keep the handful of query rows
    val q = featsOf(media.filter(col("media_id").isin(queryIds: _*)))
      .select(col("media_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("media_id").asc)
    broadcast(q).join(feats, col("query_id") =!= col("media_id"))
      .select(col("query_id"), col("media_id"),
        VectorSim.cosinePre(VectorSim.dot(col("qe"), col("e")),
          col("qn"), col("nrm")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("media_id").as("neighbor_id"), col("rank"), col("cos"))
  }

  /** Resize pass for image rows; non-image rows pass through unchanged.
    * Decodable images go through the REAL raster path (ImageIO decode →
    * nearest-neighbor scale → PNG re-encode) with metadata updated to the
    * new geometry; payloads the decoder rejects fall back to the
    * fixed-size byte fake (a raw-raster stand-in), keeping the pass
    * total — a corrupt image must not kill the partition. */
  def resizeImages(media: Dataset[MediaRow], width: Int, height: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      if (m.kind != "image") m
      else Codec.resizeImage(m.bytes, width, height) match {
        case Some(png) => m.copy(bytes = png,
          meta = m.meta.copy(width = Some(width), height = Some(height),
            format = Some("png")))
        case None => m.copy(bytes = FakeCodec.resize(m.bytes, width * height),
          // meta must describe the payload it sits next to: the fallback
          // is a width x height raw raster, not the original geometry
          meta = m.meta.copy(width = Some(width), height = Some(height),
            format = Some("raw")))
      }
    })
  }

  /** Frame sampling for video rows: one output row per kept frame. */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int, stride: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      FakeCodec.sampleFrames(m.bytes, frameSize, stride).zipWithIndex.map {
        case (b, i) => Frame(m.media_id, i, b)
      }
    })
  }
}
