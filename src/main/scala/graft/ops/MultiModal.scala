package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * assets as opaque `binary` payloads plus a typed metadata struct, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * REAL DECODERS EXIST for every format the JDK ships a codec for:
  * [[MediaCodecs.ImageCodec]] (PNG/JPEG/GIF/BMP via javax.imageio),
  * [[MediaCodecs.WavCodec]] (WAV/AU/AIFF via javax.sound), real resize and
  * real multi-frame sampling ([[MediaCodecs.resizeImages]] /
  * [[MediaCodecs.sampleImageFrames]]). [[StubCodec]] remains only for
  * formats with no JDK codec (video containers, MP3/FLAC, WebP) — it
  * derives a deterministic fake feature vector from the payload bytes
  * (md5-keyed). Either way the execution machinery is identical and
  * load-bearing at scale: the schema contract, the partition-wise batched
  * execution shape (the same iterator-of-batches shape an Arrow-based UDF
  * sees), and the partitioning. Swapping codecs changes no plan.
  *
  * Scale posture: payloads never shuffle through an aggregation — feature
  * extraction is mapPartitions (narrow, no exchange); only the small
  * (id, features) projection moves downstream. `batchSize` bounds peak
  * memory per task the way Arrow record batches do.
  */
object MultiModal {

  /** Typed metadata carried next to every payload (names+types contract;
    * nullability follows the source). */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Asset-table schema: id + opaque payload + metadata struct. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", metaSchema)))

  /** (name, type) view of a schema — the part of the contract assertions
    * compare (nullability is source-dependent). */
  def shape(s: StructType): Seq[(String, String)] =
    s.fields.toSeq.map(f => (f.name, f.dataType.simpleString))

  /** Derive an asset table from the documents fixture (payload = utf-8
    * bytes of the text; metadata synthesized deterministically from it).
    * This is the test harness's stand-in for `spark.read.format("binaryFile")`
    * over a real asset store — same schema contract. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        (length(col("text")) % 640).cast("int").as("width"),
        (length(col("text")) % 480).cast("int").as("height"),
        (length(col("text")) * 10L).as("duration_ms")).as("meta"))

  /** THE CODEC SEAM: decode is the one step this environment cannot supply
    * (no image/audio libraries), so it is isolated behind this trait —
    * swapping in a real decoder is configuration, not surgery, and changes
    * no plan. Implementations must be Serializable (instances ship to
    * executors) and should be deterministic per payload when results feed
    * an oracle. `decodeBatch` receives one bounded batch of
    * (asset_id, payload) pairs at a time — the Arrow record-batch execution
    * shape — so a vectorizing decoder amortizes per-call setup across the
    * batch and peak memory stays bounded regardless of partition size. */
  trait AssetCodec extends Serializable {
    /** Feature dimensionality of [[decodeBatch]]'s output vectors. */
    def dims: Int
    /** Decode one bounded batch; one (asset_id, features) row per asset. */
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Iterator[(Long, Array[Float])]
  }

  /** STUB codec: deterministic fake features from md5(payload, i), each in
    * [0, 1). The seam around it is real and load-bearing; only this class
    * body awaits a real image/audio library. */
  final class StubCodec(val dims: Int = 64) extends AssetCodec {
    override def decodeBatch(batch: Seq[(Long, Array[Byte])]): Iterator[(Long, Array[Float])] = {
      val md = MessageDigest.getInstance("MD5")
      batch.iterator.map { case (id, payload) =>
        id -> Array.tabulate(dims) { i =>
          md.reset()
          md.update(payload)
          md.update(i.toByte)
          val h = md.digest()
          // first 3 bytes as a 24-bit unsigned int, scaled to [0,1)
          val v = ((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)
          v.toFloat / (1 << 24)
        }
      }
    }
  }

  /** Decode + feature-extract through a pluggable [[AssetCodec]]:
    * (asset_id, features array<float>). Executes partition-wise in batches
    * of `batchSize` rows — the iterator-of-batches execution shape of an
    * Arrow-based pipeline, bounding per-task memory regardless of
    * partition size. Narrow (no exchange): payloads never shuffle. */
  def decodeFeatures(assets: DataFrame, codec: AssetCodec,
                     batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    // Null asset_id/payload rows are excluded up front: the schema allows
    // them (source-dependent), and one such row would otherwise NPE inside
    // the codec and kill the whole decode job (the H13-class posture:
    // degenerate rows must never be job-fatal). Undecodable rows are simply
    // absent from the features output — join back by id to find them.
    val in: Dataset[Row] = assets
      .where(col("asset_id").isNotNull && col("payload").isNotNull)
      .select("asset_id", "payload")
    in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // One "record batch" at a time: a vectorizing decoder sees the
        // whole batch in a single call.
        codec.decodeBatch(batch.map(r => (r.getLong(0), r.getAs[Array[Byte]](1))))
          .map { case (id, fs) => Row(id, fs) }
      }
    }(enc)
    // NOT spark.createDataFrame(out.rdd, schema): that deserializes every
    // row and severs the plan into an RDD scan (no codegen fusion, no AQE
    // stats downstream); the mapPartitions Dataset already has outSchema.
  }

  /** [[decodeFeatures]] with the deterministic [[StubCodec]]. */
  def stubDecodeFeatures(assets: DataFrame, dims: Int = 64,
                         batchSize: Int = 64): DataFrame =
    decodeFeatures(assets, new StubCodec(dims), batchSize)

  /** Resize stub: clamp/update metadata and truncate the payload to the
    * "resized" byte budget — metadata math is real, the byte transform is
    * the stub. Pure column expressions; no shuffle. */
  def stubResize(assets: DataFrame, w: Int, h: Int): DataFrame = {
    val budget = lit(w * h)
    assets.select(
      col("asset_id"),
      substring(col("payload"), 1, w * h).as("payload"),
      struct(
        col("meta.mime").as("mime"),
        least(col("meta.width"), lit(w)).cast("int").as("width"),
        least(col("meta.height"), lit(h)).cast("int").as("height"),
        col("meta.duration_ms").as("duration_ms")).as("meta"),
      least(length(col("payload")), budget).as("resized_bytes"))
  }

  /** Frame-sample stub: cut `n` evenly-spaced fixed-width "frames" out of
    * the payload (a real video decoder would seek to n timestamps instead
    * of byte offsets). Output is (asset_id, frame_no, frame binary) — one
    * row per frame, pure column expressions, no shuffle. */
  def stubFrameSample(assets: DataFrame, n: Int, frameBytes: Int = 32): DataFrame = {
    val stride = greatest(
      floor((length(col("payload")) - lit(frameBytes)) / lit(math.max(n - 1, 1))),
      lit(0)).cast("int")
    assets.select(
        col("asset_id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)), i =>
          col("payload").substr(lit(1) + i * stride, lit(frameBytes)))))
      .toDF("asset_id", "frame_no", "frame")
  }

  /** Partition assets for downstream batch inference: hash on asset_id into
    * `n` partitions so each inference task sees a bounded, shuffled-once
    * slice. */
  def partitionForInference(assets: DataFrame, n: Int): DataFrame =
    assets.repartition(n, col("asset_id"))
}
