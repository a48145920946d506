package graft.api

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{DedupOps, MultiModal}

/** The whole training-data pipeline, composed: quality filter → linear
  * dedup decision → fingerprints → (stub) feature extraction → sink.
  * One logical graph; asserts the stage contracts hold end to end. */
class EndToEndPipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("filter → dedup → fingerprint → featurize → sink composes and conserves rows") {
    val docs = TestSpark.table("documents")

    // 1. Quality + language filter.
    val kept = Pipelines.qualityFilter(docs, col("doc_id"), col("text"))
    val keptN = kept.count()
    assert(keptN > 0 && keptN <= docs.count())

    // 2. Linear dedup decision over the kept docs.
    val toks = DedupOps.tokenSet(kept, col("doc_id"), col("text"))
    val unique = DedupOps.minhashDedupKeep(toks, 8)
      .where(!col("is_dup")).select("doc_id")
    val uniqueN = unique.count()
    assert(uniqueN > 0 && uniqueN <= keptN)

    // 3. Fingerprints for the surviving docs (incremental-dedup handle).
    val surviving = docs.join(unique, "doc_id")
    val fp = Pipelines.fingerprints(surviving, col("doc_id"), col("text"))
    assert(fp.count() == uniqueN)

    // 4. Stub featurization of the surviving docs as binary assets.
    val features = MultiModal.stubDecodeFeatures(
      MultiModal.assetsFromDocuments(surviving), dims = 16)
    assert(features.count() == uniqueN)

    // 5. Sink + read-back.
    val out = java.nio.file.Files.createTempDirectory("graft-e2e").toString + "/features"
    features.write.parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == uniqueN)
    assert(back.schema.fieldNames.toSeq == Seq("asset_id", "features"))
  }
}
