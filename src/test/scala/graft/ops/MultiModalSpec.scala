package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The multimodal plumbing must hold its schema/partitioning/batching
  * contract even though the decode body is a stub (SURVEY.md §2.6 posture:
  * swap the stub for a codec, change no plan). */
class MultiModalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def assets = MultiModal.assetsFromDocuments(TestSpark.table("documents"))

  test("asset table carries the declared schema (binary payload + typed meta)") {
    assert(MultiModal.shape(assets.schema) == MultiModal.shape(MultiModal.assetSchema))
    val r = assets.orderBy("asset_id").head()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(r.getStruct(2).getString(0) == "application/octet-stream")
  }

  test("stub decode emits fixed-dim float features, deterministically") {
    val f1 = MultiModal.stubDecodeFeatures(assets, dims = 16)
    assert(MultiModal.shape(f1.schema) ==
      Seq("asset_id" -> "bigint", "features" -> "array<float>"))
    val rows = f1.orderBy("asset_id").collect()
    assert(rows.length == assets.count())
    assert(rows.forall(_.getSeq[Float](1).length == 16))
    assert(rows.forall(_.getSeq[Float](1).forall(v => v >= 0f && v < 1f)))
    // Determinism: same payloads, same features.
    val again = MultiModal.stubDecodeFeatures(assets, dims = 16)
      .orderBy("asset_id").collect()
    assert(rows.map(_.getSeq[Float](1)).toSeq == again.map(_.getSeq[Float](1)).toSeq)
  }

  test("codec seam: a custom AssetCodec plugs in with no plan change") {
    // A trivial real-ish codec: features from payload length + position.
    class LenCodec(val dims: Int) extends MultiModal.AssetCodec {
      override def decodeBatch(batch: Seq[(Long, Array[Byte])]): Iterator[(Long, Array[Float])] =
        batch.iterator.map { case (id, p) =>
          id -> Array.tabulate(dims)(i => (p.length % (i + 2)).toFloat)
        }
    }
    val out = MultiModal.decodeFeatures(assets, new LenCodec(4), batchSize = 16)
    assert(MultiModal.shape(out.schema) ==
      Seq("asset_id" -> "bigint", "features" -> "array<float>"))
    val rows = out.orderBy("asset_id").collect()
    assert(rows.length == assets.count())
    assert(rows.forall(_.getSeq[Float](1).length == 4))
    // Same narrow no-shuffle plan as the stub codec: the seam is config.
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"codec swap changed the plan:\n$plan")
  }

  test("decode is a narrow map — no shuffle added over the scan") {
    val plan = MultiModal.stubDecodeFeatures(assets).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in decode plan:\n$plan")
  }

  test("batch size does not change results (Arrow-batch-shaped execution)") {
    val a = MultiModal.stubDecodeFeatures(assets, dims = 8, batchSize = 4)
      .orderBy("asset_id").collect().map(_.getSeq[Float](1)).toSeq
    val b = MultiModal.stubDecodeFeatures(assets, dims = 8, batchSize = 1024)
      .orderBy("asset_id").collect().map(_.getSeq[Float](1)).toSeq
    assert(a == b)
  }

  test("resize clamps metadata and bounds payload") {
    val r = MultiModal.stubResize(assets, 8, 4).orderBy("asset_id").collect()
    assert(r.forall(_.getStruct(2).getInt(1) <= 8))
    assert(r.forall(_.getStruct(2).getInt(2) <= 4))
    assert(r.forall(x => x.getAs[Array[Byte]]("payload").length <= 32))
  }

  test("frame sampling yields n frames per asset of the requested width") {
    val fs = MultiModal.stubFrameSample(assets, n = 4, frameBytes = 8)
    val counts = fs.groupBy("asset_id").count().collect()
    assert(counts.forall(_.getLong(1) == 4))
    val frames = fs.limit(20).collect()
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length <= 8))
  }

  test("inference partitioning hashes assets into the requested slices") {
    val p = MultiModal.partitionForInference(assets, 7)
    assert(p.rdd.getNumPartitions == 7)
    assert(p.count() == assets.count())
  }
}
