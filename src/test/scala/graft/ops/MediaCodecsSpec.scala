package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The decode step is REAL now: JDK-built-in codecs (ImageIO for
  * PNG/JPEG/GIF/BMP, javax.sound for WAV) fill the AssetCodec seam with
  * genuine pixel/sample decoding. Fixtures are generated in-memory with the
  * same JDK encoders, so every byte decoded here round-tripped through a
  * real container format. */
class MediaCodecsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // --- fixture builders -----------------------------------------------------

  /** Solid-color image encoded through a real ImageIO writer. */
  private def imageBytes(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, bos), s"no ImageIO writer for $format")
    bos.toByteArray
  }

  /** Animated GIF: `frames` solid frames with increasing red level. */
  private def animatedGifBytes(w: Int, h: Int, frames: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until frames).foreach { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val c = (f * 255 / math.max(frames - 1, 1)) << 16
        var y = 0
        while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, c); x += 1 }; y += 1 }
        writer.writeToSequence(new IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Mono 16-bit PCM WAV of a sine at `freq` Hz, amplitude in [0,1]. */
  private def wavBytes(freq: Double, amplitude: Double, seconds: Double,
                       rate: Float = 16000f): Array[Byte] = {
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * amplitude * 32767).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = (s >> 8).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def assetDf(rows: (Long, Array[Byte])*): DataFrame = {
    val data = rows.map { case (id, p) =>
      Row(id, p, Row("application/octet-stream", null, null, null))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), MultiModal.assetSchema)
  }

  // --- images ---------------------------------------------------------------

  test("ImageCodec decodes real PNG/JPEG/BMP pixels into pooled RGB features") {
    val assets = assetDf(
      1L -> imageBytes(16, 16, 0xff0000, "png"),   // red
      2L -> imageBytes(20, 12, 0x00ff00, "bmp"),   // green, non-square
      3L -> imageBytes(16, 16, 0x808080, "jpg"))   // mid gray (JPEG lossy)
    val feats = MultiModal.decodeFeatures(assets, new MediaCodecs.ImageCodec(2, 2))
      .orderBy("asset_id").collect()
    assert(feats.length == 3)
    val Seq(red, green, gray) = feats.toSeq.map(_.getSeq[Float](1))
    assert(red.length == 2 * 2 * 3)
    // Solid red: every cell's (r,g,b) ≈ (1,0,0); PNG/BMP are lossless → exact.
    red.grouped(3).foreach { c => assert(c(0) == 1f && c(1) == 0f && c(2) == 0f) }
    green.grouped(3).foreach { c => assert(c(0) == 0f && c(1) == 1f && c(2) == 0f) }
    // JPEG is lossy: mid-gray cells within a tolerance.
    gray.foreach(v => assert(math.abs(v - 128f / 255f) < 0.05f, s"gray ch $v"))
  }

  test("pooling grid maps pixel regions to the right cells") {
    // 2x2-cell image: left half red, right half blue.
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0xff0000 else 0x0000ff)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val feats = MultiModal.decodeFeatures(assetDf(1L -> bos.toByteArray),
        new MediaCodecs.ImageCodec(2, 1))
      .head().getSeq[Float](1)
    assert(feats.slice(0, 3).toSeq == Seq(1f, 0f, 0f)) // left cell red
    assert(feats.slice(3, 6).toSeq == Seq(0f, 0f, 1f)) // right cell blue
  }

  test("corrupt and truncated payloads are row-absent, never job-fatal") {
    val good = imageBytes(8, 8, 0xff0000, "png")
    val assets = assetDf(
      1L -> good,
      2L -> Array[Byte](1, 2, 3, 4),          // not an image
      3L -> good.take(20),                    // truncated container
      4L -> Array.emptyByteArray)             // empty payload
    val out = MultiModal.decodeFeatures(assets, new MediaCodecs.ImageCodec(2, 2))
    assert(out.select("asset_id").as[Long](spark.implicits.newLongEncoder)
      .collect().toSet == Set(1L))
  }

  test("imageMeta probes format and geometry from headers only") {
    val assets = assetDf(
      1L -> imageBytes(33, 17, 0xff0000, "png"),
      2L -> imageBytes(8, 24, 0x00ff00, "jpg"),
      3L -> Array[Byte](9, 9, 9))
    val meta = MediaCodecs.imageMeta(assets).orderBy("asset_id").collect()
    assert(meta.map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((1L, "png", 33, 17), (2L, "jpeg", 8, 24)))
  }

  test("resizeImages really rescales: output decodes to the target geometry") {
    val assets = assetDf(
      1L -> imageBytes(32, 32, 0xff0000, "png"),
      2L -> imageBytes(10, 40, 0x0000ff, "bmp"),
      3L -> Array[Byte](0, 1, 2)) // undecodable → absent
    val out = MediaCodecs.resizeImages(assets, 8, 6).orderBy("asset_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    out.foreach { r =>
      val img = ImageIO.read(new ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      assert(img.getWidth == 8 && img.getHeight == 6)
      val meta = r.getStruct(2)
      assert(meta.getString(0) == "image/png" && meta.getInt(1) == 8 && meta.getInt(2) == 6)
      assert(r.getLong(3) == r.getAs[Array[Byte]]("payload").length.toLong)
    }
    // Pixels survive the scale: the red 32x32 stays red at 8x6.
    val red = ImageIO.read(new ByteArrayInputStream(out(0).getAs[Array[Byte]]("payload")))
    assert((red.getRGB(4, 3) & 0xffffff) == 0xff0000)
  }

  test("sampleImageFrames pulls real evenly-spaced frames from an animated GIF") {
    val assets = assetDf(
      1L -> animatedGifBytes(8, 8, 10),
      2L -> imageBytes(8, 8, 0x00ff00, "png")) // single-frame degenerates to 1 row
    val frames = MediaCodecs.sampleImageFrames(assets, 4)
      .orderBy("asset_id", "frame_no").collect()
    val gifRows = frames.filter(_.getLong(0) == 1L)
    assert(gifRows.map(_.getInt(1)).toSeq == Seq(0, 3, 6, 9))
    // Frame content is real: red level rises with frame index (0 → 255).
    val reds = gifRows.map { r =>
      val img = ImageIO.read(new ByteArrayInputStream(r.getAs[Array[Byte]](2)))
      (img.getRGB(4, 4) >> 16) & 0xff
    }
    assert(reds.toSeq == reds.sorted.toSeq && reds.head == 0 && reds.last == 255,
      s"red ramp: ${reds.toSeq}")
    assert(frames.count(_.getLong(0) == 2L) == 1)
  }

  // --- audio ----------------------------------------------------------------

  test("WavCodec decodes real WAV samples into per-window RMS energy") {
    // Half loud sine, half silence → first windows ≈ 0.707·amp, last ≈ 0.
    val loud = wavBytes(440, 0.8, 0.1)
    val silent = wavBytes(440, 0.0, 0.1)
    val halfAndHalf = {
      val n = 1600
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n / 2) {
        val s = (math.sin(2 * math.Pi * 440 * i / 16000.0) * 0.8 * 32767).toShort
        pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = (s >> 8).toByte; i += 1
      }
      val fmt = new AudioFormat(16000f, 16, 1, true, false)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val assets = assetDf(1L -> loud, 2L -> silent, 3L -> halfAndHalf,
      4L -> Array[Byte](1, 2, 3)) // not audio → absent
    val feats = MultiModal.decodeFeatures(assets, new MediaCodecs.WavCodec(4))
      .orderBy("asset_id").collect()
    assert(feats.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val Seq(l, s, hh) = feats.toSeq.map(_.getSeq[Float](1))
    l.foreach(v => assert(math.abs(v - 0.8 * 0.7071) < 0.02, s"loud rms $v"))
    s.foreach(v => assert(v == 0f))
    assert(math.abs(hh(0) - 0.8 * 0.7071) < 0.02 && hh(3) == 0f,
      s"half-and-half envelope: ${hh.toSeq}")
  }

  test("audioMeta reads rate/channels/duration from the WAV header") {
    val assets = assetDf(1L -> wavBytes(440, 0.5, 0.25), 2L -> Array[Byte](7))
    val meta = MediaCodecs.audioMeta(assets).collect()
    assert(meta.length == 1)
    val r = meta(0)
    assert(r.getLong(0) == 1L && r.getFloat(1) == 16000f && r.getInt(2) == 1)
    assert(r.getLong(3) == 4000L && r.getLong(4) == 250L)
  }

  // --- plan shape -----------------------------------------------------------

  test("real codecs keep the narrow no-shuffle plan of the seam") {
    val assets = assetDf(1L -> imageBytes(8, 8, 0xff0000, "png"))
    Seq(
      MultiModal.decodeFeatures(assets, new MediaCodecs.ImageCodec(2, 2)),
      MediaCodecs.imageMeta(assets),
      MediaCodecs.resizeImages(assets, 4, 4),
      MediaCodecs.sampleImageFrames(assets, 2),
      MediaCodecs.audioMeta(assets)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"real codec added a shuffle:\n$plan")
    }
  }
}
