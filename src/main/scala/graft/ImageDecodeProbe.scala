package graft

import org.apache.spark.sql.functions._

import graft.ops.{MediaCodecs, MultiModal}

/** Diagnosis probe (not driver contract): decompose `x_image_decode`'s
  * cost — the bench extra crept 1.02× → 1.08× of its 0.41 s pin across
  * rounds 12–13 against an untouched path, under the flag line but
  * drifting. Stages, cheapest to fullest, all over the SAME persisted
  * synthetic-PNG assets the bench uses:
  *
  *   1. scan      — payload byte count (the iteration floor)
  *   2. sniff     — magic-byte container detection (pure codegen)
  *   3. header    — imageMeta header-only dims probe (no pixel decode)
  *   4. decode    — ImageIO.read every pixel, emit one float
  *   5. decode+pool — the full ImageCodec(4,4) bench path
  *
  * decode − scan isolates ImageIO; (decode+pool) − decode isolates the
  * pooling loop. Run at IDLE (loadavg printed per stage) — the
  * round-12/13 drift adjudications both found load sensitivity on this
  * sub-0.5 s extra.
  *
  * Usage: runMain graft.ImageDecodeProbe [sfDir] [reps]
  */
object ImageDecodeProbe {

  /** Decode-only codec: full pixel decode, no pooling — isolates
    * ImageIO.read from the grid loop. */
  private final class DecodeOnly extends MultiModal.AssetCodec {
    override val dims: Int = 1
    override def decodeBatch(batch: Seq[(Long, Array[Byte])]): Iterator[(Long, Array[Float])] = {
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
      batch.iterator.flatMap { case (id, payload) =>
        (try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload)))
        catch { case _: Exception => None })
          .iterator.map(img => id -> Array((img.getWidth * img.getHeight).toFloat))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.engine.Graft.session("graft-imgprobe")
    graft.sources.Catalog.register(spark, sfDir)
    val docs = spark.table("documents")
    val assets = MediaCodecs.syntheticImageAssets(
      docs.select(col("doc_id")), col("doc_id")).persist()
    println(s"== assets=${assets.count()}")
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    def t(tag: String)(thunk: => Unit): Unit = {
      thunk // warm
      val samples = (1 to reps).map { _ =>
        val la = loadAvg()
        val t0 = System.nanoTime()
        thunk
        ((System.nanoTime() - t0) / 1e9, la)
      }
      val med = samples.map(_._1).sorted.apply(reps / 2)
      println(f"== $tag%-14s median=$med%6.3f s  " +
        samples.map { case (s, la) => f"$s%5.3f@$la%.1f" }.mkString("samples[", " ", "]"))
    }
    t("scan") {
      assets.agg(sum(length(col("payload")))).head()
    }
    t("sniff") {
      assets.select(MediaCodecs.sniffFormat(col("payload")).as("f"))
        .groupBy("f").count().collect()
    }
    t("header") {
      MediaCodecs.imageMeta(assets).agg(sum(col("width"))).head()
    }
    t("decode") {
      MultiModal.decodeFeatures(assets, new DecodeOnly)
        .agg(count(lit(1))).head()
    }
    t("decode+pool") {
      MultiModal.decodeFeatures(assets, new MediaCodecs.ImageCodec(4, 4))
        .agg(count(lit(1))).head()
    }
    spark.stop()
  }
}
