package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.TextOps

/** The streaming contamination filter must be stateless (pure
  * projection+filter per micro-batch), replay-equivalent to its batch
  * form, and one-sided: a contaminated document can never pass. */
class StreamSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def probeShingles = {
    val d = TestSpark.table("documents").where(col("doc_id") < 10)
    d.select(explode(TextOps.wordShingles(col("text"), 3)).as("sh"))
      .distinct()
  }

  test("streamed filter emits exactly the batch filter's survivors") {
    val docs = TestSpark.table("documents")
      .where(col("doc_id") >= 10).select("doc_id", "text")
      .as[Doc].collect().toSeq.sortBy(_.doc_id)
    val batchKept = StreamOps.contaminationFilter(
        TestSpark.table("documents").where(col("doc_id") >= 10),
        "text", probeShingles, "sh")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val mem = MemoryStream[Doc]
    val q = StreamOps.contaminationFilter(mem.toDF(), "text", probeShingles, "sh")
      .writeStream.format("memory").queryName("t_contam").outputMode("append").start()
    try {
      docs.grouped(docs.size / 3 + 1).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("t_contam")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batchKept)
      assert(batchKept.nonEmpty, "vacuous if the filter drops everything")
    } finally q.stop()
  }

  test("no contaminated doc can pass (Bloom one-sidedness end to end)") {
    // Exact contaminated set (the q82 semi join); every one of them must
    // be dropped — false positives only ever REMOVE clean docs.
    val corp = TestSpark.table("documents").where(col("doc_id") >= 10)
    val exact = corp
      .select(col("doc_id"), explode(TextOps.wordShingles(col("text"), 3)).as("sh"))
      .join(probeShingles, Seq("sh"), "left_semi")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val kept = StreamOps.contaminationFilter(corp, "text", probeShingles, "sh")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.intersect(exact).isEmpty)
    // And keepContaminated=true yields a superset of the exact set.
    val flagged = StreamOps.contaminationFilter(
        corp, "text", probeShingles, "sh", keepContaminated = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged))
  }

  test("the streaming plan is stateless — no state store operator") {
    val mem = MemoryStream[Doc]
    val q = StreamOps.contaminationFilter(mem.toDF(), "text", probeShingles, "sh")
      .writeStream.format("memory").queryName("t_contam_plan").outputMode("append").start()
    try {
      mem.addData(Doc(11L, "row column sort stream"))
      q.processAllAvailable()
      val plan = q.lastProgress.stateOperators
      assert(plan == null || plan.isEmpty,
        s"expected no state operators, got ${plan.mkString(",")}")
    } finally q.stop()
  }
}
