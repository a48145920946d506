package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL multimodal decode over the JDK's built-in codecs — no external
  * libraries. `javax.imageio` ships PNG / JPEG / GIF / BMP / WBMP readers
  * and `javax.sound.sampled` ships WAV/AU/AIFF PCM, so the
  * [[MultiModal.AssetCodec]] seam can be filled with genuine decoders here:
  * [[ImageCodec]] (average-pooled RGB features), [[WavCodec]] (windowed
  * RMS energy features), real [[resizeImages]] (decode → scale → re-encode),
  * real multi-frame [[sampleImageFrames]] (animated GIF), and header-only
  * [[imageMeta]] / [[audioMeta]] probes. [[MultiModal.StubCodec]] remains
  * for formats the JDK cannot read (video containers, MP3/FLAC, WebP).
  *
  * Scale posture is inherited from the seam: every operator here is a
  * narrow `mapPartitions` (payloads never shuffle), batched by the caller's
  * `batchSize` through [[MultiModal.decodeFeatures]], and per-row failures
  * are row-absent rather than job-fatal (a poisoned asset in a 100 TB scan
  * must not kill the stage — join back by id to audit the skipped set).
  */
object MediaCodecs {

  /** Executor-side ImageIO setup, idempotent: headless AWT (no X server on
    * cluster nodes) and no disk-backed ImageIO cache (a temp FILE per decode
    * call would throttle a 32-thread executor on /tmp IO). */
  private def initImageIo(): Unit = {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
  }

  private def readImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None } // corrupt payload → row-absent, not job-fatal

  /** REAL image codec: decode via ImageIO, then average-pool the pixels into
    * a `gridW`×`gridH` grid of mean (R, G, B) cells — dims = gridW·gridH·3,
    * each channel normalized to [0, 1]. The classic cheap visual signature:
    * deterministic, resolution-independent, and good enough to drive the
    * embedding-side operators (cosine near-dup, ANN) on real images.
    * Undecodable or empty payloads are absent from the output. */
  final class ImageCodec(gridW: Int = 4, gridH: Int = 4) extends MultiModal.AssetCodec {
    require(gridW > 0 && gridH > 0, s"grid must be positive, got ${gridW}x$gridH")
    override val dims: Int = gridW * gridH * 3

    override def decodeBatch(batch: Seq[(Long, Array[Byte])]): Iterator[(Long, Array[Float])] = {
      initImageIo()
      batch.iterator.flatMap { case (id, payload) =>
        readImage(payload).iterator.map(img => id -> pool(img))
      }
    }

    private def pool(img: BufferedImage): Array[Float] = {
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Long](dims)
      val counts = new Array[Long](gridW * gridH)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w) // one bulk row read, not w getRGB calls
        val cy = y * gridH / h
        var x = 0
        while (x < w) {
          val cell = cy * gridW + x * gridW / w
          val rgb = row(x)
          sums(cell * 3) += (rgb >> 16) & 0xff
          sums(cell * 3 + 1) += (rgb >> 8) & 0xff
          sums(cell * 3 + 2) += rgb & 0xff
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(dims) { i =>
        val n = counts(i / 3)
        if (n == 0) 0f else sums(i).toFloat / (255f * n)
      }
    }
  }

  /** REAL audio codec: decode WAV/AU/AIFF via javax.sound, mix to mono at
    * 16-bit, and emit per-window RMS energy over `windows` equal time
    * slices — dims = windows, each in [0, 1] of digital full scale. The
    * standard cheap audio signature (silence/clipping detection, rough
    * loudness envelope for segment dedup). Undecodable payloads are absent
    * from the output. */
  final class WavCodec(windows: Int = 8) extends MultiModal.AssetCodec {
    require(windows > 0, s"windows must be positive, got $windows")
    override val dims: Int = windows

    override def decodeBatch(batch: Seq[(Long, Array[Byte])]): Iterator[(Long, Array[Float])] =
      batch.iterator.flatMap { case (id, payload) =>
        decodeSamples(payload).iterator.map(samples => id -> rmsWindows(samples))
      }

    private def rmsWindows(samples: Array[Float]): Array[Float] = {
      val n = samples.length
      val out = new Array[Float](windows)
      if (n == 0) return out
      var w = 0
      while (w < windows) {
        val from = (w.toLong * n / windows).toInt
        val until = math.max(((w + 1).toLong * n / windows).toInt, from + 1).min(n)
        var acc = 0.0
        var i = from
        while (i < until) { acc += samples(i).toDouble * samples(i); i += 1 }
        out(w) = math.sqrt(acc / math.max(until - from, 1)).toFloat
        w += 1
      }
      out
    }
  }

  /** Decode an audio payload to mono float samples in [-1, 1], converting
    * whatever PCM shape the container holds to signed 16-bit first (the
    * javax.sound converter handles u8/s8/s16/endianness). None when the
    * payload is not a readable audio file. */
  private def decodeSamples(payload: Array[Byte]): Option[Array[Float]] =
    try {
      val src = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val f = src.getFormat
        val target = new AudioFormat(f.getSampleRate, 16, f.getChannels, true, false)
        val pcm = AudioSystem.getAudioInputStream(target, src)
        val bytes = pcm.readAllBytes()
        val ch = target.getChannels
        val frames = bytes.length / (2 * ch)
        val out = new Array[Float](frames)
        var i = 0
        while (i < frames) {
          var mix = 0
          var c = 0
          while (c < ch) {
            val off = (i * ch + c) * 2
            mix += ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort
            c += 1
          }
          out(i) = mix.toFloat / (ch * 32768f)
          i += 1
        }
        Some(out)
      } finally src.close()
    } catch { case _: Exception => None }

  /** Deterministic synthetic image assets rendered through the REAL PNG
    * encoder — the bench/test fixture generator when no asset store exists
    * in the environment. Each id renders a `w`×`h` two-tone gradient keyed
    * by the id (not solid color, so PNG row filtering does nontrivial
    * work and decode cost is representative). Narrow; payloads are honest
    * PNG containers the [[ImageCodec]] round-trips. */
  def syntheticImageAssets(ids: DataFrame, idCol: Column,
                           w: Int = 32, h: Int = 32): DataFrame = {
    require(w > 0 && h > 0, s"geometry must be positive, got ${w}x$h")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(MultiModal.assetSchema)
    val in: Dataset[Row] = ids.where(idCol.isNotNull).select(idCol.cast("long").as("id"))
    in.mapPartitions { rows =>
      initImageIo()
      rows.map { r =>
        val id = r.getLong(0)
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val base = (id * 0x9e3779b9L).toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rr = (base & 0xff) * (x + 1) / w
            val gg = ((base >> 8) & 0xff) * (y + 1) / h
            val bb = ((base >> 16) & 0xff) * (x + y + 2) / (w + h)
            img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(img, "png", bos)
        val png = bos.toByteArray
        Row(id, png, Row("image/png", w, h, null))
      }
    }(enc)
  }

  /** Container-format sniff by MAGIC BYTES — a pure column expression (a
    * substring+hex compare chain inside whole-stage codegen: no decode, no
    * UDF, no mapPartitions), so auditing a petabyte of assets costs one
    * scan. Deliberately recognizes formats the JDK CANNOT decode
    * (mp4/mp3/webp) — the point of the coverage report is to NAME what a
    * decode pass will skip, not just count it. Null payloads sniff as
    * "missing", unrecognized ones as "unknown". */
  def sniffFormat(payload: Column): Column = {
    def pfx(off: Int, hexStr: String) =
      hex(substring(payload, off, hexStr.length / 2)) === lit(hexStr)
    when(payload.isNull, "missing")
      .when(pfx(1, "89504E47"), "png")
      .when(pfx(1, "FFD8FF"), "jpeg")
      .when(pfx(1, "474946"), "gif")
      .when(pfx(1, "52494646") && pfx(9, "57415645"), "wav")
      .when(pfx(1, "52494646") && pfx(9, "57454250"), "webp")
      .when(pfx(1, "464F524D") && pfx(9, "41494646"), "aiff")
      .when(pfx(1, "2E736E64"), "au")
      .when(pfx(1, "424D"), "bmp")
      .when(pfx(1, "494433") || pfx(1, "FFFB") || pfx(1, "FFF3") || pfx(1, "FFF2"), "mp3")
      .when(pfx(5, "66747970"), "mp4")
      .when(pfx(1, "664C6143"), "flac")
      .otherwise("unknown")
  }

  private val imageMetaSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** HEADER-ONLY image metadata probe: (asset_id, format, width, height)
    * without decoding pixel data — `ImageReader.getWidth/getHeight` parse
    * only the header, so probing a petabyte of assets costs header bytes of
    * CPU per row, not a full decode. Narrow; unreadable payloads absent. */
  def imageMeta(assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(imageMetaSchema)
    val in: Dataset[Row] = assets
      .where(col("asset_id").isNotNull && col("payload").isNotNull)
      .select("asset_id", "payload")
    in.mapPartitions { rows =>
      initImageIo()
      rows.flatMap { r =>
        val stream = ImageIO.createImageInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        try {
          val readers = ImageIO.getImageReaders(stream)
          if (!readers.hasNext) Iterator.empty
          else {
            val reader = readers.next()
            try {
              reader.setInput(stream, true, true)
              // Locale.ROOT: a tr_TR default locale would fold "GIF" to
              // "gıf" (dotless i) and break format comparisons.
              Iterator.single(Row(r.getLong(0),
                reader.getFormatName.toLowerCase(java.util.Locale.ROOT),
                reader.getWidth(0), reader.getHeight(0)))
            } catch { case _: Exception => Iterator.empty }
            finally reader.dispose()
          }
        } finally stream.close()
      }
    }(enc)
  }

  private val audioMetaSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("sample_rate", FloatType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Header-only audio metadata probe: (asset_id, sample_rate, channels,
    * frames, duration_ms) from the container header. Narrow; unreadable
    * payloads absent. */
  def audioMeta(assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(audioMetaSchema)
    val in: Dataset[Row] = assets
      .where(col("asset_id").isNotNull && col("payload").isNotNull)
      .select("asset_id", "payload")
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val ff = AudioSystem.getAudioFileFormat(
            new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val f = ff.getFormat
          val frames = ff.getFrameLength.toLong
          val ms =
            if (frames >= 0 && f.getFrameRate > 0) (frames * 1000L / f.getFrameRate.toLong)
            else -1L
          Iterator.single(Row(r.getLong(0), f.getSampleRate, f.getChannels, frames, ms))
        } catch { case _: Exception => Iterator.empty }
      }
    }(enc)
  }

  private val containerMetaSchema = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("container", StringType, nullable = false),
    StructField("brand", StringType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("bitrate_kbps", IntegerType, nullable = true)))

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
    ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Walk the ISO-BMFF sibling boxes in `b[from, until)`, yielding
    * (type, payloadStart, payloadEnd). Size 1 means 64-bit largesize,
    * size 0 means to-end-of-enclosing; malformed sizes end the walk
    * (header-probe posture: salvage what parses, never throw). */
  private def mp4Boxes(b: Array[Byte], from: Int, until: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var off = from
      def hasNext: Boolean = off + 8 <= until
      def next(): (String, Int, Int) = {
        val size32 = be32(b, off)
        val typ = fourCC(b, off + 4)
        val (payload, end) =
          if (size32 == 1L && off + 16 <= until) {
            val sz = be64(b, off + 8)
            (off + 16, if (sz >= 16 && off + sz <= until) (off + sz).toInt else until)
          }
          else if (size32 == 0L) (off + 8, until)
          else if (size32 >= 8L && off + size32 <= until) (off + 8, (off + size32).toInt)
          else (off + 8, until) // malformed: consume the rest, stop after
        off = end
        (typ, payload, end)
      }
    }

  /** `mvhd` payload → duration in ms (version picks 32/64-bit fields). */
  private def mvhdDurationMs(b: Array[Byte], p: Int, end: Int): Option[Long] = {
    if (p + 4 > end) return None
    val v = b(p) & 0xff
    val (tsOff, durLen) = if (v == 1) (p + 4 + 16, 8) else (p + 4 + 8, 4)
    if (tsOff + 4 + durLen > end) return None
    val timescale = be32(b, tsOff)
    val duration = if (durLen == 8) be64(b, tsOff + 4) else be32(b, tsOff + 4)
    // All-ones is ISO-BMFF's "duration unknown" sentinel (common in
    // fragmented MP4) — surfacing it would put ~49 days into the
    // coverage report's duration sum.
    val unknown = if (durLen == 8) duration == -1L else duration == 0xffffffffL
    if (timescale > 0 && !unknown) Some(duration * 1000L / timescale) else None
  }

  /** `tkhd` payload → (width, height) from the trailing 16.16 fixed-point
    * fields; audio tracks carry (0, 0). */
  private def tkhdDims(b: Array[Byte], p: Int, end: Int): Option[(Int, Int)] = {
    if (p + 4 > end) return None
    val v = b(p) & 0xff
    val wOff = p + 4 + (if (v == 1) 32 else 20) + 52
    if (wOff + 8 > end) None
    else Some(((be32(b, wOff) >> 16).toInt, (be32(b, wOff + 4) >> 16).toInt))
  }

  /** MP4: `ftyp` major brand + `moov/mvhd` duration + max `trak/tkhd`
    * video dims. Pure byte arithmetic over the box tree — no codec. */
  private def mp4Meta(b: Array[Byte]): Option[(String, Option[Long], Option[Int], Option[Int])] = {
    var brand: Option[String] = None
    var dur: Option[Long] = None
    var w = 0; var h = 0
    var sawBox = false
    mp4Boxes(b, 0, b.length).foreach {
      case ("ftyp", p, end) if p + 4 <= end =>
        sawBox = true; brand = Some(fourCC(b, p).trim)
      case ("moov", p, end) =>
        sawBox = true
        mp4Boxes(b, p, end).foreach {
          case ("mvhd", q, e) => dur = mvhdDurationMs(b, q, e)
          case ("trak", q, e) =>
            mp4Boxes(b, q, e).foreach {
              case ("tkhd", t, te) => tkhdDims(b, t, te).foreach { case (tw, th) =>
                w = math.max(w, tw); h = math.max(h, th)
              }
              case _ =>
            }
          case _ =>
        }
      case _ =>
    }
    if (!sawBox) None
    else Some((brand.getOrElse("isom"), dur,
      if (w > 0) Some(w) else None, if (h > 0) Some(h) else None))
  }

  // MPEG audio Layer III tables, indexed by [mpeg1?][bitrate index] and
  // [version bits][samplerate index].
  private val mp3BitrateV1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val mp3BitrateV2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val mp3SampleRate: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000),  // MPEG1
    2 -> Array(22050, 24000, 16000),  // MPEG2
    0 -> Array(11025, 12000, 8000))   // MPEG2.5

  /** MP3: skip an ID3v2 tag (syncsafe size), find the first Layer-III
    * frame sync, read bitrate/samplerate/channel-mode from the 4-byte
    * frame header, and estimate duration from the audio byte count at
    * that bitrate (exact for CBR — the common case — an honest estimate
    * for VBR). */
  private def mp3Meta(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    val hasId3 = b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3'
    // Same evidence bar as sniffFormat: an ID3v2 tag, or a frame sync at
    // offset 0. Without it, scanning arbitrary binary for 0xFFEx would
    // false-positive (a PNG's pixel bytes can contain a "sync").
    if (!hasId3 && !(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0))
      return None
    val audioStart =
      if (hasId3)
        10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
              ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
      else 0
    var i = audioStart
    val scanEnd = math.min(b.length - 4, audioStart + 4096) // sync sits just past the tag (padding allowed)
    while (i <= scanEnd) {
      if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xe0) == 0xe0) {
        val version = (b(i + 1) >> 3) & 3
        val layer = (b(i + 1) >> 1) & 3
        val bi = (b(i + 2) >> 4) & 0xf
        val si = (b(i + 2) >> 2) & 3
        val mode = (b(i + 3) >> 6) & 3
        if (layer == 1 && bi > 0 && bi < 15 && si < 3 && version != 1) { // Layer III, valid indices
          val kbps = if (version == 3) mp3BitrateV1(bi) else mp3BitrateV2(bi)
          val rate = mp3SampleRate(version)(si)
          val channels = if (mode == 3) 1 else 2
          val ms = (b.length - audioStart).toLong * 8L / kbps
          return Some((kbps, rate, channels, ms))
        }
      }
      i += 1
    }
    None
  }

  private def le24(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16)

  private def le32(b: Array[Byte], off: Int): Long =
    le24(b, off).toLong | ((b(off + 3) & 0xffL) << 24)

  /** WebP (RIFF): canvas dims from the first VP8 (lossy sync-coded),
    * VP8L (lossless bit-packed) or VP8X (extended, 24-bit LE minus-one)
    * chunk — three different bit layouts, all header-only. */
  private def webpDims(b: Array[Byte]): Option[(Int, Int)] = {
    var off = 12L
    while (off + 8 <= b.length) {
      val o = off.toInt
      val cc = fourCC(b, o)
      val sz = le32(b, o + 4)
      val p = o + 8
      cc match {
        case "VP8 " if p + 11 <= b.length &&
            (b(p + 3) & 0xff) == 0x9d && (b(p + 4) & 0xff) == 0x01 && (b(p + 5) & 0xff) == 0x2a =>
          return Some(((le24(b, p + 6) & 0x3fff), (le24(b, p + 8) & 0x3fff)))
        case "VP8L" if p + 5 <= b.length && (b(p) & 0xff) == 0x2f =>
          val bits = le32(b, p + 1)
          return Some((((bits & 0x3fff) + 1).toInt, (((bits >> 14) & 0x3fff) + 1).toInt))
        case "VP8X" if p + 10 <= b.length =>
          return Some((le24(b, p + 4) + 1, le24(b, p + 7) + 1))
        case _ =>
      }
      // Long arithmetic: a malformed/adversarial 32-bit chunk size must
      // not wrap Int and stall or reverse the walk. sz is unsigned here,
      // so every iteration advances by at least the 8-byte header — a
      // legal zero-size chunk (encoder padding) just walks on.
      off = p.toLong + sz + (sz & 1L)
    }
    None
  }

  /** FLAC: STREAMINFO (the mandatory first metadata block) carries
    * sample rate (20 bits), channels-1 (3 bits) and total samples
    * (36 bits) — exact duration with zero decoding. */
  private def flacMeta(b: Array[Byte]): Option[(Int, Int, Long)] = {
    var off = 4
    while (off + 4 <= b.length) {
      val hdr = b(off) & 0xff
      val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      val p = off + 4
      if ((hdr & 0x7f) == 0) { // STREAMINFO
        if (p + 18 > b.length) return None
        val rate = ((b(p + 10) & 0xff) << 12) | ((b(p + 11) & 0xff) << 4) | ((b(p + 12) & 0xff) >> 4)
        val channels = ((b(p + 12) >> 1) & 0x7) + 1
        val total = ((b(p + 13) & 0x0fL) << 32) | ((b(p + 14) & 0xffL) << 24) |
          ((b(p + 15) & 0xffL) << 16) | ((b(p + 16) & 0xffL) << 8) | (b(p + 17) & 0xffL)
        return if (rate > 0) Some((rate, channels, total * 1000L / rate)) else None
      }
      if ((hdr & 0x80) != 0) return None // last block, no STREAMINFO seen
      off = p + len
    }
    None
  }

  /** HEADER-ONLY container metadata for the formats the JDK has no codec
    * for: MP4 (`ftyp` brand, `mvhd` duration, `tkhd` track dims), MP3
    * (frame-header bitrate/samplerate/channels, CBR duration estimate),
    * WebP (VP8/VP8L/VP8X canvas dims) and FLAC (STREAMINFO rate/channels/
    * exact duration) — pure byte arithmetic, no decode, narrow
    * `mapPartitions`. This is the metadata tier of the coverage report: a
    * 100 TB asset audit can name and measure its video/audio holdings
    * without any codec on the cluster. Unparseable payloads are absent
    * (probe posture, like [[imageMeta]]/[[audioMeta]]). */
  def containerMeta(assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(containerMetaSchema)
    val in: Dataset[Row] = assets
      .where(col("asset_id").isNotNull && col("payload").isNotNull)
      .select("asset_id", "payload")
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        val isMp4 = b.length >= 12 && fourCC(b, 4) == "ftyp"
        val isWebp = b.length >= 16 && fourCC(b, 0) == "RIFF" && fourCC(b, 8) == "WEBP"
        val isFlac = b.length >= 8 && fourCC(b, 0) == "fLaC"
        val out: Option[Row] =
          if (isMp4)
            mp4Meta(b).map { case (brand, dur, w, h) =>
              Row(id, "mp4", brand, dur.map(java.lang.Long.valueOf).orNull,
                w.map(Integer.valueOf).orNull, h.map(Integer.valueOf).orNull,
                null, null, null)
            }
          else if (isWebp)
            webpDims(b).map { case (w, h) =>
              Row(id, "webp", null, null, Integer.valueOf(w), Integer.valueOf(h),
                null, null, null)
            }
          else if (isFlac)
            flacMeta(b).map { case (rate, ch, ms) =>
              Row(id, "flac", null, java.lang.Long.valueOf(ms), null, null,
                Integer.valueOf(rate), Integer.valueOf(ch), null)
            }
          else
            mp3Meta(b).map { case (kbps, rate, ch, ms) =>
              Row(id, "mp3", null, java.lang.Long.valueOf(ms), null, null,
                Integer.valueOf(rate), Integer.valueOf(ch), Integer.valueOf(kbps))
            }
        out.iterator
      }
    }(enc)
  }

  /** REAL resize: decode → bilinear-scale to exactly `w`×`h` via headless
    * Graphics2D → re-encode as PNG, with the metadata struct updated to the
    * actual output geometry. Same output shape as [[MultiModal.stubResize]]
    * (asset_id, payload, meta, resized_bytes); rows whose payload does not
    * decode are absent (audit by anti-joining ids). Narrow, batched. */
  def resizeImages(assets: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    require(w > 0 && h > 0, s"target must be positive, got ${w}x$h")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", MultiModal.metaSchema, nullable = false),
      StructField("resized_bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val in: Dataset[Row] = assets
      .where(col("asset_id").isNotNull && col("payload").isNotNull)
      .select("asset_id", "payload", "meta.duration_ms")
    in.mapPartitions { rows =>
      initImageIo()
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          readImage(r.getAs[Array[Byte]](1)).map { img =>
            val scaled = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            try {
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
            } finally g.dispose()
            val bos = new ByteArrayOutputStream()
            ImageIO.write(scaled, "png", bos)
            val png = bos.toByteArray
            val durationMs = if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2))
            Row(r.getLong(0), png, Row("image/png", w, h, durationMs), png.length.toLong)
          }
        }
      }
    }(enc)
  }

  /** REAL frame sampling for multi-frame images (animated GIF is the format
    * the JDK decodes): read the frame count from the container, pick `n`
    * evenly-spaced distinct frame indices, decode only those frames, and
    * re-encode each as PNG — (asset_id, frame_no, frame). A video-container
    * decoder drops into the same shape by seeking to n timestamps. For
    * single-frame formats (PNG/JPEG) this degenerates to one row. GIF
    * caveat: frames with partial disposal are returned as stored, not
    * composited over the previous frame. Narrow; unreadable payloads absent. */
  def sampleImageFrames(assets: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val in: Dataset[Row] = assets
      .where(col("asset_id").isNotNull && col("payload").isNotNull)
      .select("asset_id", "payload")
    in.mapPartitions { rows =>
      initImageIo()
      rows.flatMap { r =>
        val id = r.getLong(0)
        val stream = ImageIO.createImageInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        try {
          val readers = ImageIO.getImageReaders(stream)
          if (!readers.hasNext) Iterator.empty
          else {
            val reader = readers.next()
            try {
              reader.setInput(stream, false, true)
              val total = reader.getNumImages(true)
              if (total <= 0) Iterator.empty
              else {
                val picks =
                  if (n == 1 || total == 1) Array(0)
                  else Array.tabulate(n)(i => (i.toLong * (total - 1) / (n - 1)).toInt).distinct
                picks.iterator.map { idx =>
                  val frame = reader.read(idx)
                  val bos = new ByteArrayOutputStream()
                  ImageIO.write(frame, "png", bos)
                  Row(id, idx, bos.toByteArray)
                }.toVector.iterator // materialize before the reader is disposed
              }
            } catch { case _: Exception => Iterator.empty }
            finally reader.dispose()
          }
        } finally stream.close()
      }
    }(enc)
  }

  /** One parsed MP4 video track: sample-entry codec fourCC plus the
    * KEYFRAME samples' absolute byte ranges in the container
    * (sample_no 1-based, offset, size). */
  final case class Mp4Frames(codec: String, frames: Vector[(Int, Long, Long)])

  /** Parse the FIRST video track's sample table (`stbl`) into keyframe
    * byte ranges — pure byte arithmetic over stsd/stsz/stsc/stco|co64/
    * stss, no codec:
    *  - `stsd`'s first sample entry names the codec (`jpeg` = MJPEG —
    *    every sample is a standalone JPEG image the JDK CAN decode);
    *  - per-sample offsets derive from the chunk map (`stsc` runs over
    *    `stco`/`co64` chunk offsets) plus the cumulative `stsz` sizes
    *    within each chunk;
    *  - `stss` lists sync samples (keyframes); ABSENT means every sample
    *    is a keyframe (ISO 14496-12 §8.6.2 — true for MJPEG).
    * Salvage posture like [[mp4Meta]]: anything malformed or
    * out-of-bounds yields None / drops the sample, never throws. */
  def mp4FrameTable(b: Array[Byte]): Option[Mp4Frames] = {
    if (b.length < 12 || fourCC(b, 4) != "ftyp") return None
    var found: Option[Mp4Frames] = None
    mp4Boxes(b, 0, b.length).foreach {
      case ("moov", p, end) =>
        mp4Boxes(b, p, end).foreach {
          case ("trak", q, e) if found.isEmpty =>
            found = trakFrames(b, q, e)
          case _ =>
        }
      case _ =>
    }
    found
  }

  private def trakFrames(b: Array[Byte], from: Int, until: Int): Option[Mp4Frames] = {
    var stbl: Option[(Int, Int)] = None
    var isVideo = false
    mp4Boxes(b, from, until).foreach {
      case ("mdia", p, end) =>
        mp4Boxes(b, p, end).foreach {
          case ("hdlr", q, e) if q + 12 <= e =>
            isVideo = fourCC(b, q + 8) == "vide"
          case ("minf", q, e) =>
            mp4Boxes(b, q, e).foreach {
              case ("stbl", s, se) => stbl = Some((s, se))
              case _ =>
            }
          case _ =>
        }
      case _ =>
    }
    if (!isVideo) return None
    stbl.flatMap { case (s, se) =>
      var codec: Option[String] = None
      var sizes: Array[Long] = null
      var chunkOffs: Array[Long] = null
      var stscRuns: Array[(Long, Long)] = null // (first_chunk, samples_per_chunk)
      var sync: Array[Int] = null               // 1-based sample numbers, or null = all
      mp4Boxes(b, s, se).foreach {
        case ("stsd", p, e) if p + 16 <= e =>
          // v/f(4) entry_count(4), first entry: size(4) format(4)
          codec = Some(fourCC(b, p + 12).trim)
        case ("stsz", p, e) if p + 12 <= e =>
          val uniform = be32(b, p + 4)
          val n = be32(b, p + 8).toInt
          if (n >= 0 && n < (1 << 22)) {
            if (uniform != 0) sizes = Array.fill(n)(uniform)
            else if (p + 12 + 4L * n <= e)
              sizes = Array.tabulate(n)(i => be32(b, p + 12 + 4 * i))
          }
        case ("stsc", p, e) if p + 8 <= e =>
          val n = be32(b, p + 4).toInt
          if (n >= 0 && p + 8 + 12L * n <= e)
            stscRuns = Array.tabulate(n) { i =>
              (be32(b, p + 8 + 12 * i), be32(b, p + 8 + 12 * i + 4))
            }
        case ("stco", p, e) if p + 8 <= e =>
          val n = be32(b, p + 4).toInt
          if (n >= 0 && p + 8 + 4L * n <= e)
            chunkOffs = Array.tabulate(n)(i => be32(b, p + 8 + 4 * i))
        case ("co64", p, e) if p + 8 <= e =>
          val n = be32(b, p + 4).toInt
          if (n >= 0 && p + 8 + 8L * n <= e)
            chunkOffs = Array.tabulate(n)(i => be64(b, p + 8 + 8 * i))
        case ("stss", p, e) if p + 8 <= e =>
          val n = be32(b, p + 4).toInt
          if (n >= 0 && p + 8 + 4L * n <= e)
            sync = Array.tabulate(n)(i => be32(b, p + 8 + 4 * i).toInt)
        case _ =>
      }
      if (codec.isEmpty || sizes == null || chunkOffs == null || stscRuns == null
          || sizes.isEmpty || chunkOffs.isEmpty || stscRuns.isEmpty) None
      else {
        // Walk chunks in order; an stsc run covers [first_chunk, next run's
        // first_chunk). Accumulate each sample's absolute offset.
        val offsets = new Array[Long](sizes.length)
        var sample = 0
        var run = 0
        var chunk = 1L // 1-based
        while (chunk <= chunkOffs.length && sample < sizes.length) {
          while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= chunk) run += 1
          val perChunk = stscRuns(run)._2.toInt
          var off = chunkOffs((chunk - 1).toInt)
          var i = 0
          while (i < perChunk && sample < sizes.length) {
            offsets(sample) = off
            off += sizes(sample)
            sample += 1; i += 1
          }
          chunk += 1
        }
        val keyNos: Array[Int] =
          if (sync != null) sync.filter(no => no >= 1 && no <= sample)
          else Array.tabulate(sample)(_ + 1)
        val frames = keyNos.iterator.map { no =>
          (no, offsets(no - 1), sizes(no - 1))
        }.filter { case (_, off, len) =>
          off >= 0 && len > 0 && off + len <= b.length
        }.toVector
        if (frames.isEmpty) None else Some(Mp4Frames(codec.get, frames))
      }
    }
  }

  /** KEYFRAME extraction from MP4 containers — the video-side twin of
    * [[sampleImageFrames]]: parse the sample table, pick `n` evenly-spaced
    * keyframes, and slice their byte ranges out of the payload —
    * (asset_id, frame_no, sample_no, codec, frame). NO codec runs here;
    * for MJPEG tracks (`codec = 'jpeg'`) each frame IS a standalone JPEG,
    * so the slices feed [[ImageCodec]] / [[imageMeta]] / the image
    * near-dup path directly — real video-frame curation with zero
    * cluster-side video codecs. H.264/H.265 tracks still extract (the
    * byte ranges are exact) but their frames need an external decoder —
    * they stay absent from image-decodability counts downstream. Narrow;
    * malformed containers row-absent. */
  def extractMp4Frames(assets: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("sample_no", IntegerType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val in: Dataset[Row] = assets
      .where(col("asset_id").isNotNull && col("payload").isNotNull)
      .select("asset_id", "payload")
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        mp4FrameTable(b).iterator.flatMap { t =>
          val total = t.frames.length
          val picks =
            if (n == 1 || total == 1) Array(0)
            else Array.tabulate(n)(i => (i.toLong * (total - 1) / (n - 1)).toInt).distinct
          picks.iterator.zipWithIndex.map { case (idx, frameNo) =>
            val (sampleNo, off, len) = t.frames(idx)
            Row(id, frameNo, sampleNo, t.codec,
              java.util.Arrays.copyOfRange(b, off.toInt, (off + len).toInt))
          }
        }
      }
    }(enc)
  }
}
