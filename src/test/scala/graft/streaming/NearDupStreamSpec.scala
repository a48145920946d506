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

  test("batch mode of the same operator matches the keep-bit decision") {
    val batch = StreamOps.nearDupFilter(TestSpark.table("documents"), "text")
    val keep = DedupOps.minhashDedupKeepFast(
      TestSpark.table("documents"), col("doc_id"), col("text"), 8)
      .where(!col("is_dup"))
    assert(batch.count() == keep.count())
  }
}
