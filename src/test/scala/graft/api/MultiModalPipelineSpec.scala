package graft.api

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.MultiModal

/** End-to-end multimodal curation: real PNG decode → pooled features →
  * LSH-bucketed cosine near-dup, through the Pipelines facade. */
class MultiModalPipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def png(rgbAt: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, rgbAt(x, y))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def assets: DataFrame = {
    val red = png((_, _) => 0xff0000)
    // Near-duplicate of red: one pixel nudged — pooled features barely move.
    val redTweaked = png((x, y) => if (x == 0 && y == 0) 0xfe0100 else 0xff0000)
    val blue = png((_, _) => 0x0000ff)
    val rows = Seq(
      Row(1L, red, Row("image/png", 16, 16, null)),
      Row(2L, redTweaked, Row("image/png", 16, 16, null)),
      Row(3L, blue, Row("image/png", 16, 16, null)),
      Row(4L, Array[Byte](1, 2, 3), Row("application/octet-stream", null, null, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultiModal.assetSchema)
  }

  test("imageNearDuplicates: real decode feeds the text path's LSH dedup") {
    val pairs = Pipelines.imageNearDuplicates(assets, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // The tweaked red is the only near-dup pair; solid blue is orthogonal
    // to solid red in pooled-RGB space (cosine 0), and the corrupt payload
    // never reaches the vector stage.
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("imageFeatures: decodable assets only, fixed dims") {
    val feats = Pipelines.imageFeatures(assets, grid = 4).collect()
    assert(feats.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(feats.forall(_.getSeq[Float](1).length == 4 * 4 * 3))
  }

  // ISO-BMFF box: 4-byte big-endian size + fourCC + payload.
  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1")).put(payload)
    bb.array()
  }

  /** Minimal-but-real MP4: ftyp(isom) + moov(mvhd ts=1000 dur=5500,
    * trak(tkhd 640x360)) — exactly the boxes the header probe parses. */
  private def mp4Fixture: Array[Byte] = {
    val mvhd = java.nio.ByteBuffer.allocate(20)
      .putInt(0)           // version 0 + flags
      .putInt(0).putInt(0) // creation, modification
      .putInt(1000)        // timescale
      .putInt(5500)        // duration → 5500 ms
      .array()
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84) // v0 layout, zero-filled
      bb.putInt(8, 1)            // track id
      bb.putInt(16, 5500)        // duration
      bb.putInt(76, 640 << 16)   // width, 16.16 fixed
      bb.putInt(80, 360 << 16)   // height
      bb.array()
    }
    val ftyp = java.nio.ByteBuffer.allocate(8)
      .put("isom".getBytes("ISO-8859-1")).putInt(0x200).array()
    box("ftyp", ftyp) ++ box("moov", mvhd0(mvhd) ++ box("trak", box("tkhd", tkhd)))
  }
  private def mvhd0(payload: Array[Byte]): Array[Byte] = box("mvhd", payload)

  /** ID3v2 tag (empty body) + one MPEG1 Layer III frame header (128 kbps,
    * 44.1 kHz, joint stereo) + CBR audio bytes sized for exactly 1000 ms. */
  private def mp3Fixture: Array[Byte] = {
    val id3 = "ID3".getBytes("ISO-8859-1") ++ Array[Byte](3, 0, 0, 0, 0, 0, 0)
    val frame = Array(0xff, 0xfb, 0x90, 0x40).map(_.toByte) // sync|V1 L3, bi=9 si=0, joint stereo
    id3 ++ frame ++ new Array[Byte](16000 - 4) // 16000 audio bytes @128kbps = 1000 ms
  }

  /** Lossless WebP: RIFF/WEBP + one VP8L chunk; dims bit-packed as
    * (width-1) | (height-1) << 14 after the 0x2f signature byte. */
  private def webpFixture(w: Int, h: Int): Array[Byte] = {
    val bits = (w - 1) | ((h - 1) << 14)
    val vp8l = Array[Byte](0x2f,
      (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
      ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte, 0)
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + vp8l.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(4 + 8 + vp8l.length)
      .put("WEBP".getBytes("ISO-8859-1"))
      .put("VP8L".getBytes("ISO-8859-1")).putInt(vp8l.length).put(vp8l)
    bb.array()
  }

  /** FLAC: fLaC magic + a last-flagged STREAMINFO block — 22.05 kHz,
    * stereo, 16-bit, 44100 total samples (exactly 2000 ms). */
  private def flacFixture: Array[Byte] = {
    val si = new Array[Byte](34)
    si(10) = 0x05; si(11) = 0x62.toByte; si(12) = 0x22 // rate 22050, ch 2
    si(13) = 0xf0.toByte                               // bps 16, total high nibble 0
    si(16) = 0xac.toByte; si(17) = 0x44                // total samples 44100
    "fLaC".getBytes("ISO-8859-1") ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ si
  }

  test("containerMeta: hand-built MP4 boxes and MP3 frame header parse without a codec") {
    val rows = Seq(
      Row(10L, mp4Fixture, Row("video/mp4", null, null, null)),
      Row(11L, mp3Fixture, Row("audio/mpeg", null, null, null)),
      Row(12L, png((_, _) => 0x00ff00), Row("image/png", 16, 16, null)),
      Row(13L, Array[Byte](1, 2, 3), Row("application/octet-stream", null, null, null)),
      Row(14L, webpFixture(320, 200), Row("image/webp", null, null, null)),
      Row(15L, flacFixture, Row("audio/flac", null, null, null)),
      // Adversarial RIFF: chunk size 0xFFFFFFF8 would stall or reverse an
      // Int-arithmetic walk — must be absent, not hang the job.
      Row(16L, "RIFF".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0) ++
        "WEBP".getBytes("ISO-8859-1") ++ "JUNK".getBytes("ISO-8859-1") ++
        Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
        new Array[Byte](64), Row("image/webp", null, null, null)),
      // MP4 with the ISO-BMFF unknown-duration sentinel: duration null,
      // not ~49 days summed into the coverage report.
      Row(17L, box("ftyp", java.nio.ByteBuffer.allocate(8)
          .put("isom".getBytes("ISO-8859-1")).putInt(0x200).array()) ++
        box("moov", mvhd0(java.nio.ByteBuffer.allocate(20)
          .putInt(0).putInt(0).putInt(0).putInt(1000).putInt(-1).array())),
        Row("video/mp4", null, null, null)))
    val table = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultiModal.assetSchema)
    val meta = graft.ops.MediaCodecs.containerMeta(table).collect()
      .map(r => r.getLong(0) -> r).toMap
    // Only the parseable container formats probe; png/junk/malformed-RIFF
    // are absent (and the malformed chunk walk terminates).
    assert(meta.keySet == Set(10L, 11L, 14L, 15L, 17L))
    assert(meta(17L).getString(1) == "mp4" && meta(17L).isNullAt(3),
      "unknown-duration sentinel must surface as null")
    val wp = meta(14L)
    assert(wp.getString(1) == "webp" && wp.getInt(4) == 320 && wp.getInt(5) == 200)
    assert(wp.isNullAt(3) && wp.isNullAt(6))
    val fl = meta(15L)
    assert(fl.getString(1) == "flac" && fl.getLong(3) == 2000L)
    assert(fl.getInt(6) == 22050 && fl.getInt(7) == 2 && fl.isNullAt(8))
    val m4 = meta(10L)
    assert(m4.getString(1) == "mp4" && m4.getString(2) == "isom")
    assert(m4.getLong(3) == 5500L, s"mp4 duration: ${m4.getLong(3)}")
    assert(m4.getInt(4) == 640 && m4.getInt(5) == 360)
    assert(m4.isNullAt(6) && m4.isNullAt(7) && m4.isNullAt(8))
    val m3 = meta(11L)
    assert(m3.getString(1) == "mp3" && m3.isNullAt(2))
    assert(m3.getLong(3) == 1000L, s"mp3 duration: ${m3.getLong(3)}")
    assert(m3.isNullAt(4) && m3.isNullAt(5))
    assert(m3.getInt(6) == 44100 && m3.getInt(7) == 2 && m3.getInt(8) == 128)
  }

  test("coverageReport carries real mp4/mp3 metadata instead of undecodable-only") {
    val rows = Seq(
      Row(20L, mp4Fixture, Row("video/mp4", null, null, null)),
      Row(21L, mp3Fixture, Row("audio/mpeg", null, null, null)),
      Row(22L, png((_, _) => 0x00ff00), Row("image/png", 16, 16, null)))
    val table = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultiModal.assetSchema)
    val rep = Pipelines.coverageReport(table).collect()
      .map(r => r.getString(0) -> r).toMap
    // mp4/mp3 stay UNdecodable (no codec — honest) but now carry metadata.
    assert(rep("mp4").getLong(2) == 0 && rep("mp4").getLong(4) == 1
      && rep("mp4").getLong(5) == 5500L)
    assert(rep("mp3").getLong(2) == 0 && rep("mp3").getLong(4) == 1
      && rep("mp3").getLong(5) == 1000L)
    // Decodable formats count as metadata-bearing too; no container duration.
    assert(rep("png").getLong(2) == 1 && rep("png").getLong(4) == 1
      && rep("png").isNullAt(5))
  }

  test("coverageReport: per-format decodable/undecodable counts over a mixed table") {
    // What the StubCodec-era gap looks like to a curation run: the mp4 is
    // NAMED (magic bytes) even though no JDK codec exists for it, and a
    // corrupt png is undecodable despite its recognized format.
    val mp4 = Array[Byte](0, 0, 0, 24, 'f', 't', 'y', 'p', 'i', 's', 'o', 'm',
      0, 0, 0, 0x20)
    val corrupt = png((_, _) => 0xff0000).take(20) // valid magic, truncated body
    val rows = Seq(
      Row(1L, png((_, _) => 0xff0000), Row("image/png", 16, 16, null)),
      Row(2L, png((_, _) => 0x0000ff), Row("image/png", 16, 16, null)),
      Row(3L, mp4, Row("video/mp4", null, null, null)),
      Row(4L, corrupt, Row("image/png", null, null, null)),
      Row(5L, Array[Byte](1, 2, 3), Row("application/octet-stream", null, null, null)))
    val table = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultiModal.assetSchema)
    val rep = Pipelines.coverageReport(table).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rep("png") == ((3L, 2L, 1L)), s"png row: ${rep.get("png")}")
    assert(rep("mp4") == ((1L, 0L, 1L)), s"mp4 row: ${rep.get("mp4")}")
    assert(rep("unknown") == ((1L, 0L, 1L)), s"unknown row: ${rep.get("unknown")}")
    assert(rep.keySet == Set("png", "mp4", "unknown"))
  }

  private def jpeg(rgb: Int): Array[Byte] = {
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** A REAL (minimal) MJPEG-in-MP4: ftyp + mdat holding the given JPEG
    * samples back-to-back + moov(trak(tkhd, mdia(hdlr 'vide',
    * minf(stbl(stsd 'jpeg', stsz per-sample, stsc one run, stco one
    * chunk[, stss]))))) — exactly the sample-table boxes
    * `mp4FrameTable` walks, with offsets that honestly point into
    * mdat. */
  private def mjpegFixture(samples: Seq[Array[Byte]],
                           stss: Option[Seq[Int]]): Array[Byte] = {
    def be(i: Int) = java.nio.ByteBuffer.allocate(4).putInt(i).array()
    val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(8)
      .put("isom".getBytes("ISO-8859-1")).putInt(0x200).array())
    val mdatPayloadOff = ftyp.length + 8
    val mdat = box("mdat", samples.reduce(_ ++ _))
    val stsd = box("stsd", be(0) ++ be(1) ++
      (be(16) ++ "jpeg".getBytes("ISO-8859-1") ++ new Array[Byte](8)))
    val stsz = box("stsz", be(0) ++ be(0) ++ be(samples.size) ++
      samples.flatMap(s => be(s.length)).toArray)
    val stsc = box("stsc", be(0) ++ be(1) ++ (be(1) ++ be(samples.size) ++ be(1)))
    val stco = box("stco", be(0) ++ be(1) ++ be(mdatPayloadOff))
    val stssBox = stss.map(nos =>
      box("stss", be(0) ++ be(nos.size) ++ nos.flatMap(be).toArray))
      .getOrElse(Array.emptyByteArray)
    val hdlr = box("hdlr", be(0) ++ be(0) ++
      "vide".getBytes("ISO-8859-1") ++ new Array[Byte](12))
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(8, 1); bb.putInt(76, 16 << 16); bb.putInt(80, 16 << 16)
      bb.array()
    }
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco ++ stssBox)
    val trak = box("trak", box("tkhd", tkhd) ++
      box("mdia", hdlr ++ box("minf", stbl)))
    ftyp ++ mdat ++ box("moov", mvhd0(java.nio.ByteBuffer.allocate(20)
      .putInt(0).putInt(0).putInt(0).putInt(1000).putInt(3000).array()) ++ trak)
  }

  test("extractMp4Frames: MJPEG keyframes slice out as decodable JPEGs") {
    val reds = jpeg(0xff0000); val green = jpeg(0x00ff00); val blue = jpeg(0x0000ff)
    val rows = Seq(
      // stss marks samples 1 and 3 as keyframes → green (sample 2) is
      // never extracted.
      Row(30L, mjpegFixture(Seq(reds, green, blue), Some(Seq(1, 3))),
        Row("video/mp4", null, null, null)),
      // No stss → every sample is a keyframe (the MJPEG norm).
      Row(31L, mjpegFixture(Seq(reds, green, blue), None),
        Row("video/mp4", null, null, null)),
      // Metadata-only mp4 (no sample table) and junk: row-absent.
      Row(32L, mp4Fixture, Row("video/mp4", null, null, null)),
      Row(33L, Array[Byte](1, 2, 3), Row("application/octet-stream", null, null, null)))
    val table = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultiModal.assetSchema)
    val frames = graft.ops.MediaCodecs.extractMp4Frames(table, 3).collect()
    val byAsset = frames.groupBy(_.getLong(0))
    assert(byAsset.keySet == Set(30L, 31L))
    // Asset 30: exactly the 2 sync samples, bytes EQUAL to the original
    // JPEG payloads (slicing is exact, not approximate).
    val f30 = byAsset(30L).sortBy(_.getInt(1))
    assert(f30.map(_.getInt(2)).toSeq == Seq(1, 3))
    assert(f30.forall(_.getString(3) == "jpeg"))
    assert(java.util.Arrays.equals(f30(0).getAs[Array[Byte]](4), reds))
    assert(java.util.Arrays.equals(f30(1).getAs[Array[Byte]](4), blue))
    // Asset 31: all three samples are keyframes; n=3 picks all.
    assert(byAsset(31L).map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3))
    // The extracted frames feed the REAL image path: decode + pool.
    val feats = Pipelines.imageFeatures(
      graft.ops.MediaCodecs.extractMp4Frames(table, 1)
        .select((col("asset_id") * 10 + col("frame_no")).as("asset_id"),
          col("frame").as("payload")), grid = 1).collect()
    assert(feats.length == 2) // one first-keyframe per MJPEG asset
    feats.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v(0) > 0.8f && v(1) < 0.2f && v(2) < 0.2f,
        s"first keyframe must decode solid red, got $v")
    }
  }

  test("coverageReport: MJPEG mp4 counts decodable, metadata-only mp4 does not") {
    val rows = Seq(
      Row(40L, mjpegFixture(Seq(jpeg(0xff0000), jpeg(0x0000ff)), None),
        Row("video/mp4", null, null, null)),
      Row(41L, mp4Fixture, Row("video/mp4", null, null, null)),
      Row(42L, png((_, _) => 0x00ff00), Row("image/png", 16, 16, null)))
    val table = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultiModal.assetSchema)
    val rep = Pipelines.coverageReport(table).collect()
      .map(r => r.getString(0) -> r).toMap
    // n_assets=2, n_decodable=1 (the MJPEG one), both carry metadata.
    assert(rep("mp4").getLong(1) == 2 && rep("mp4").getLong(2) == 1
      && rep("mp4").getLong(3) == 1 && rep("mp4").getLong(4) == 2,
      s"mp4 row: ${rep("mp4")}")
    assert(rep("png").getLong(2) == 1)
  }
}
