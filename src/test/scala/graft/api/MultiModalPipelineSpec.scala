package graft.api

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
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
}
