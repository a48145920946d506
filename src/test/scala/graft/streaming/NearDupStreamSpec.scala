package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.DedupOps

final case class Doc(doc_id: Long, text: String)

/** Streaming near-dup filtering must admit exactly the batch decision's
  * keepers: one survivor per MinHash signature, first-seen wins. */
class NearDupStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streaming near-dup filter admits one doc per signature cluster") {
    val docs = TestSpark.table("documents").select("doc_id", "text")
      .as[Doc].collect().toSeq.sortBy(_.doc_id)
    val expectClusters = DedupOps
      .minhashDedupKeepFast(TestSpark.table("documents"), col("doc_id"), col("text"), 8)
      .where(!col("is_dup")).count()

    val mem = MemoryStream[Doc]
    val q = StreamOps.nearDupFilter(mem.toDF(), "text")
      .writeStream.format("memory").queryName("t_neardup").outputMode("append").start()
    try {
      docs.grouped(docs.size / 3 + 1).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val admitted = spark.table("t_neardup")
      assert(admitted.count() == expectClusters,
        "stream must admit exactly one doc per signature cluster")
      // Re-feeding the same docs admits nothing new.
      mem.addData(docs.take(20)); q.processAllAvailable()
      assert(spark.table("t_neardup").count() == expectClusters)
    } finally q.stop()
  }

  test("cross-run streaming dedup: stream survivors equal the batch q91 keep set") {
    val all = TestSpark.table("documents")
    val prior = DedupOps.fingerprintTable(
      all.where(col("doc_id") < 150), col("doc_id"), col("text"))
    // Batch truth: the incremental operator's keepers for the new batch.
    val expectKept = DedupOps.incrementalDedup(
        all.where(col("doc_id") >= 150), col("doc_id"), col("text"), prior)
      .where(!col("is_dup")).select("doc_id")
      .collect().map(_.getLong(0)).toSet

    val docs = all.where(col("doc_id") >= 150).select("doc_id", "text")
      .as[Doc].collect().toSeq.sortBy(_.doc_id)
    val mem = MemoryStream[Doc]
    val q = StreamOps.incrementalDedupFilter(mem.toDF(), "text", prior)
      .writeStream.format("memory").queryName("t_incdedup").outputMode("append").start()
    try {
      docs.grouped(docs.size / 4 + 1).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("t_incdedup")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == expectKept, s"stream=${streamed.size} batch=${expectKept.size}")
      assert(expectKept.nonEmpty, "vacuous if the batch keeps nothing")
      // Replaying history admits nothing: signatures known to the prior
      // run never re-enter, and within-stream repeats are droppedDuplicates.
      mem.addData(docs.take(30)); q.processAllAvailable()
      assert(spark.table("t_incdedup").count() == expectKept.size)
    } finally q.stop()
  }

  test("retractFingerprints: a taken-down keeper's signature re-admits fresh content") {
    val spark2 = spark
    import spark2.implicits._
    val all = TestSpark.table("documents")
    val prior = DedupOps.fingerprintTable(
      all.where(col("doc_id") < 150), col("doc_id"), col("text")).localCheckpoint()
    val victim = prior.agg(min("keep_id")).head().getLong(0)
    val victimText = all.where(col("doc_id") === victim).head().getAs[String]("text")
    // A fresh copy of taken-down content under a NEW id: dropped against
    // the ghost before retraction (the self-defeating-takedown hazard),
    // admitted fresh after — the DedupLoop takedown semantics on the
    // batch-era persisted state.
    val fresh = Seq((900000L, victimText)).toDF("doc_id", "text")
    assert(DedupOps.incrementalDedup(fresh, col("doc_id"), col("text"), prior)
      .head().getBoolean(2), "fresh copy should be a dup pre-retraction")
    val retracted = DedupOps.retractFingerprints(prior, Seq(victim).toDF("id"))
      .localCheckpoint()
    assert(!DedupOps.incrementalDedup(fresh, col("doc_id"), col("text"), retracted)
      .head().getBoolean(2), "retraction must re-admit matching content")
    // Only rows the victim ANCHORS leave; a non-keeper id is a no-op.
    assert(retracted.count() ==
      prior.count() - prior.where(col("keep_id") === victim).count())
    assert(DedupOps.retractFingerprints(prior, Seq(899999L).toDF("id")).count() ==
      prior.count())
  }

  test("batch mode of the same operator matches the keep-bit decision") {
    val batch = StreamOps.nearDupFilter(TestSpark.table("documents"), "text")
    val keep = DedupOps.minhashDedupKeepFast(
      TestSpark.table("documents"), col("doc_id"), col("text"), 8)
      .where(!col("is_dup"))
    assert(batch.count() == keep.count())
  }
}
