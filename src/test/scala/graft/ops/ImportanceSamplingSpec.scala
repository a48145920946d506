package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DSIR importance resampling: the hashed-ngram models must separate a
  * target-looking sub-corpus from noise, the sample must be exact-k and
  * deterministic (content-hash Gumbel noise, no RNG state), scoring must
  * be map-only, and degenerate inputs (null/empty text, null ids, dim
  * mismatch) must behave as documented. */
class ImportanceSamplingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  import scala.jdk.CollectionConverters._
  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType)))

  private def docsDf(rows: (Any, String)*) =
    spark.createDataFrame(
      rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) }.asJava, schema)

  // Deterministic synthetic corpora: "English-like" docs cycle a small
  // word pool (shared vocabulary with the target); "gibberish" docs use
  // tokens the target never contains.
  private val pool = Vector("the", "quick", "brown", "fox", "jumps", "over",
    "a", "lazy", "dog", "and", "runs", "far")
  private def engDoc(i: Int): String =
    (0 until 12).map(j => pool((i * 7 + j * 5) % pool.size)).mkString(" ")
  private def junkDoc(i: Int): String =
    (0 until 12).map(j => s"zx${(i * 31 + j * 17) % 97}q").mkString(" ")

  private val B = 1024
  private lazy val target = docsDf((0 until 40).map(i =>
    (1000L + i, engDoc(i + 3))): _*)
  private lazy val raw = docsDf(
    ((0 until 50).map(i => (i.toLong, engDoc(i))) ++
     (50 until 100).map(i => (i.toLong, junkDoc(i)))): _*)

  private lazy val ratios = ImportanceSampling.logRatios(
    ImportanceSampling.bucketProbs(target, col("text"), B),
    ImportanceSampling.bucketProbs(raw, col("text"), B))

  test("gram buckets are in range and empty grams are dropped") {
    val r = docsDf(1L -> "a b", 2L -> "", 3L -> null)
    val rows = r.select(col("doc_id"),
        ImportanceSampling.gramBuckets(col("text"), B).as("g"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Int](1)).toMap
    // "a b": unigrams [a, b] + bigram [a b] = 3 grams.
    assert(rows(1L).length == 3)
    assert(rows(1L).forall(b => b >= 0 && b < B))
    assert(rows(2L).isEmpty && rows(3L).isEmpty,
      "empty/null docs must featurize to an empty array")
  }

  test("importance log-weights separate target-looking docs from gibberish") {
    val w = ImportanceSampling.importanceLogWeights(raw, col("doc_id"), col("text"), ratios)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val engMean = (0 until 50).map(i => w(i.toLong)).sum / 50
    val junkMean = (50 until 100).map(i => w(i.toLong)).sum / 50
    assert(engMean > 0 && junkMean < 0,
      s"target-like docs must score positive (got $engMean), gibberish negative (got $junkMean)")
    assert(engMean - junkMean > 5.0, s"separation too weak: $engMean vs $junkMean")
  }

  test("null/empty text scores exactly neutral 0.0") {
    val w = ImportanceSampling
      .importanceLogWeights(docsDf(1L -> null, 2L -> ""), col("doc_id"), col("text"), ratios)
      .collect().map(_.getDouble(1))
    assert(w.forall(_ == 0.0))
  }

  test("resample is exact-k, deterministic, and overwhelmingly target-like") {
    val picked = ImportanceSampling.resampleTopK(raw, col("doc_id"), col("text"),
      ratios, k = 30, seed = "s1")
    val ids = picked.collect().map(_.getLong(0))
    assert(ids.length == 30)
    assert(ids.distinct.length == 30, "without replacement")
    val again = ImportanceSampling.resampleTopK(raw, col("doc_id"), col("text"),
      ratios, k = 30, seed = "s1").collect().map(_.getLong(0))
    assert(ids.toSeq == again.toSeq, "same seed must reproduce the same sample")
    val engCount = ids.count(_ < 50)
    assert(engCount >= 27, s"expected nearly all target-like picks, got $engCount/30")
    // A different seed draws an independent sample (same weights, new noise).
    val other = ImportanceSampling.resampleTopK(raw, col("doc_id"), col("text"),
      ratios, k = 30, seed = "s2").collect().map(_.getLong(0))
    assert(other.toSeq != ids.toSeq)
  }

  test("k larger than the corpus returns everything; null ids are dropped") {
    val withNull = docsDf(1L -> "the quick", 2L -> "brown fox",
      (null: Any) -> "lazy dog")
    val out = ImportanceSampling.resampleTopK(withNull, col("doc_id"), col("text"),
      ratios, k = 10)
    assert(out.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("scoring is map-only and the sample is a TakeOrdered, not a global sort") {
    val wPlan = ImportanceSampling
      .importanceLogWeights(raw, col("doc_id"), col("text"), ratios)
      .queryExecution.executedPlan.toString
    assert(!wPlan.contains("Exchange"), s"scoring must not shuffle:\n$wPlan")
    val sPlan = ImportanceSampling.resampleTopK(raw, col("doc_id"), col("text"),
      ratios, k = 5).queryExecution.executedPlan.toString
    assert(sPlan.contains("TakeOrderedAndProject"),
      s"top-k must not materialize a global sort:\n$sPlan")
  }

  test("model-dim mismatch and bad params refuse loudly") {
    intercept[IllegalArgumentException] {
      ImportanceSampling.logRatios(new Array[Double](8), new Array[Double](16))
    }
    intercept[IllegalArgumentException] {
      ImportanceSampling.bucketProbs(raw, col("text"), 8)
    }
    intercept[IllegalArgumentException] {
      ImportanceSampling.bucketProbs(raw, col("text"), B, alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      ImportanceSampling.resampleTopK(raw, col("doc_id"), col("text"), ratios, 0)
    }
  }

  test("Pipelines.dsirSample end-to-end facade") {
    val picked = graft.api.Pipelines.dsirSample(raw, col("doc_id"), col("text"),
      target, col("text"), k = 20, buckets = B)
    val ids = picked.collect().map(_.getLong(0))
    assert(ids.length == 20)
    assert(ids.count(_ < 50) >= 18,
      s"facade must find the target-like docs: ${ids.toSeq.sorted}")
    assert(picked.columns.toSeq == Seq("doc_id", "text"), "schema preserved")
  }
}
