package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.LinearClassifier

/** The streaming retrain loop must keep the labeled history (no
  * catastrophic forgetting when a NEW junk style arrives), track the
  * moving optimum with a small warm budget per batch, survive restart,
  * and keep replay content-stable at the prediction level. */
class ClassifierLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def real(lo: Int, hi: Int) = TestSpark.table("documents")
    .where(col("doc_id") >= lo && col("doc_id") < hi)
    .select(col("text"), lit(1.0).as("y"))

  // Junk style A: stopword + md5 fragments (the LM-gate fixture trick).
  private def junkA(lo: Int, hi: Int) = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    TestSpark.table("documents")
      .where(col("doc_id") >= lo && col("doc_id") < hi)
      .select(concat_ws(" ", (1 to 25).flatMap(i => Seq(
        lit(stop(i % stop.size)),
        substring(md5(concat(col("text"), lit(i))), 1, 7))): _*).as("text"),
        lit(0.0).as("y"))
  }

  // Junk style B: SEO keyword-spam repetition — a different failure
  // mode, arriving only in the last batch.
  private def junkB(lo: Int, hi: Int) = TestSpark.table("documents")
    .where(col("doc_id") >= lo && col("doc_id") < hi)
    .select(concat_ws(" ", (1 to 30).map(i =>
      lit(Seq("cheap", "deals", "buy", "now", "best", "price")(i % 6))): _*)
      .as("text"), lit(0.0).as("y"))

  private val dim = 1 << 14

  private def fold(b: DataFrame, id: Long, state: String, labels: String): Unit =
    ClassifierLoop.foldBatch(b, id, "text", "y", state, labels, dim, iterations = 8)

  private def keepSet(m: LinearClassifier.Model, docs: DataFrame): Set[Long] =
    LinearClassifier.score(docs, col("doc_id"), col("text"), m)
      .where(col("score") >= 0.5).collect().map(_.getLong(0)).toSet

  test("labeled folds accumulate: new junk styles learn without forgetting old ones") {
    val root = Files.createTempDirectory("graft-clsloop").toString
    val (state, labels) = (s"$root/state", s"$root/labels")

    fold(real(0, 100).unionByName(junkA(0, 100)), 0L, state, labels)
    val m1 = ClassifierLoop.currentModel(spark, state).get
    fold(real(100, 200).unionByName(junkA(100, 200)), 1L, state, labels)
    // RESTART boundary: nothing in-memory carries over; batch 2 brings
    // the unseen junk style B.
    fold(real(200, 300).unionByName(junkB(200, 300)), 2L, state, labels)
    val m3 = ClassifierLoop.currentModel(spark, state).get

    val realDocs = TestSpark.table("documents")
      .where(col("doc_id") < 300).select("doc_id", "text")
    val styleA = TestSpark.table("documents").where(col("doc_id") < 300)
      .select(col("doc_id"),
        concat_ws(" ", (1 to 25).flatMap(i => Seq(
          lit(Seq("the", "a", "of", "and", "to", "in", "is", "it")(i % 8)),
          substring(md5(concat(col("text"), lit(i))), 1, 7))): _*).as("text"))
    val styleB = TestSpark.table("documents").where(col("doc_id") < 300)
      .select(col("doc_id"),
        concat_ws(" ", (1 to 30).map(i =>
          lit(Seq("cheap", "deals", "buy", "now", "best", "price")(i % 6))): _*)
          .as("text"))

    assert(keepSet(m3, realDocs).size >= 290, "real docs must survive")
    assert(keepSet(m3, styleA).size <= 10,
      "junk style A must STAY dead after later batches (no forgetting)")
    assert(keepSet(m3, styleB).size <= 10, "junk style B must be learned")
    // The early model predates style B: under m1 its spam tokens are
    // OOV (score ≈ the prior); after the batch-2 fold they carry
    // learned negative weight — the mean score must drop well below
    // the prior, proving the fold genuinely moved the model.
    def meanScore(m: LinearClassifier.Model, docs: DataFrame): Double =
      LinearClassifier.score(docs, col("doc_id"), col("text"), m)
        .agg(avg("score")).head().getDouble(0)
    assert(meanScore(m3, styleB) < meanScore(m1, styleB) - 0.2,
      s"m1=${meanScore(m1, styleB)} m3=${meanScore(m3, styleB)}")

    // Crash replay of the LAST batch: same prior version, same store →
    // prediction-identical model (float ulps may drift; verdicts must not).
    fold(real(200, 300).unionByName(junkB(200, 300)), 2L, state, labels)
    val m3r = ClassifierLoop.currentModel(spark, state).get
    assert(keepSet(m3r, realDocs) == keepSet(m3, realDocs) &&
      keepSet(m3r, styleA) == keepSet(m3, styleA) &&
      keepSet(m3r, styleB) == keepSet(m3, styleB))
  }
}
