package graft.streaming

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{MediaCodecs, MultiModal}

case class StreamAsset(asset_id: Long, payload: Array[Byte])

/** Multimodal decode on an unbounded stream: feature extraction is a
  * stateless narrow map, so it must run under Structured Streaming with no
  * state store and replay-equal its batch form — assets arrive forever,
  * decode cost stays per-row, nothing accumulates. */
class StreamDecodeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def png(rgb: Int): Array[Byte] = {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("streamed decode equals batch decode and keeps a stateless plan") {
    val data = (1 to 12).map(i => StreamAsset(i.toLong, png(i * 0x102030))) :+
      StreamAsset(99L, Array[Byte](0, 1, 2)) // corrupt: absent from both forms
    val codec = new MediaCodecs.ImageCodec(2, 2)

    val batch = MultiModal.decodeFeatures(data.toDF(), codec)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

    val mem = MemoryStream[StreamAsset]
    val q = MultiModal.decodeFeatures(mem.toDF(), codec)
      .writeStream.format("memory").queryName("t_decode").outputMode("append").start()
    try {
      data.grouped(5).foreach { b => mem.addData(b); q.processAllAvailable() }
      val streamed = spark.table("t_decode")
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      assert(streamed == batch)
      assert(batch.size == 12 && !batch.contains(99L))
      // Stateless: no state store operator anywhere in the executed plan.
      val plan = q.lastProgress
      assert(plan == null || plan.stateOperators.isEmpty,
        s"decode added streaming state: ${plan.stateOperators.mkString(",")}")
    } finally q.stop()
  }

  test("streamed WARC ingestion equals batch and keeps a stateless plan") {
    import org.apache.spark.sql.functions.col
    // Real archives from the fixture builder + one junk payload that must
    // be row-absent in both forms (salvage, not failure).
    val docs = TestSpark.table("documents").where(col("doc_id") < 20)
    val archives = graft.ops.Warc
      .syntheticArchives(docs, col("doc_id"), col("text"))
      .collect().map(r => StreamAsset(r.getLong(0), r.getAs[Array[Byte]](1))) :+
      StreamAsset(999L, "not a warc".getBytes)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(2), r.getLong(4))).toSet

    val batch = canon(graft.api.Pipelines.warcDocuments(
      archives.toSeq.toDF("asset_id", "payload"), col("asset_id"), col("payload")))

    val mem = MemoryStream[StreamAsset]
    val q = graft.api.Pipelines.warcDocuments(
        mem.toDF(), col("asset_id"), col("payload"))
      .writeStream.format("memory").queryName("t_warc").outputMode("append").start()
    try {
      archives.grouped(7).foreach { b => mem.addData(b); q.processAllAvailable() }
      assert(canon(spark.table("t_warc")) == batch && batch.size == 20)
      val plan = q.lastProgress
      assert(plan == null || plan.stateOperators.isEmpty,
        s"WARC ingestion added streaming state: ${plan.stateOperators.mkString(",")}")
    } finally q.stop()
  }
}
