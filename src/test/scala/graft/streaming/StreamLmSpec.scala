package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.TextOps

/** The streaming LM gate (StreamOps.lmFilter): scores under the frozen
  * model must be BITWISE equal to the batch ngramScore lowering, the
  * stream replay must emit exactly the batch gate's survivors, and the
  * streaming plan must hold zero state operators. */
final case class SrcDoc(doc_id: Long, text: String, source: String)

class StreamLmSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def corpus = TestSpark.table("documents").select("doc_id", "text")
  private lazy val model = TextOps.ngramModel(corpus, col("text")).persist()

  // In-distribution fixture docs + OOV-heavy gibberish (md5 hex — the
  // q157 trick: far from English trigram mass), interleaved ids.
  private lazy val gated = {
    val real = corpus.where(col("doc_id") < 40)
    val junk = spark.range(40, 60).select(col("id").as("doc_id"),
      concat_ws(" ", md5(col("id").cast("string")),
        md5((col("id") + 1000).cast("string")),
        md5((col("id") + 2000).cast("string"))).as("text"))
    real.unionByName(junk)
  }

  test("lm_score expression is bitwise-equal to the ngramScore lowering") {
    val bytes = TextOps.ngramModelBytes(model)
    val viaExpr = gated
      .select(col("doc_id"), TextOps.lmScore(col("text"), bytes).as("s"))
      .where(col("s").isNotNull)
      .select(col("doc_id"), col("s.score"), col("s.oov_rate"), col("s.n_grams"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val viaAgg = TextOps.ngramScore(gated, col("doc_id"), col("text"), model)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(viaExpr.keySet == viaAgg.keySet)
    assert(viaExpr.nonEmpty)
    viaExpr.foreach { case (id, v) =>
      assert(v == viaAgg(id), s"doc $id: expr $v vs agg ${viaAgg(id)}") }
  }

  test("gate discriminates: real docs above the floor, gibberish below; replay exact; zero state") {
    // A floor strictly between the two clusters exists on this fixture —
    // compute it from the scores so the spec pins the separation too.
    val bytes = TextOps.ngramModelBytes(model)
    val scores = gated
      .select(col("doc_id"), TextOps.lmScore(col("text"), bytes).getField("score").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (junkIds, realIds) = scores.keySet.partition(_ >= 40)
    val maxJunk = junkIds.map(scores).max
    val minReal = realIds.map(scores).min
    assert(maxJunk < minReal,
      s"fixture gibberish ($maxJunk) must score below real docs ($minReal)")
    val floor = (maxJunk + minReal) / 2

    val batchKept = StreamOps.lmFilter(gated, "text", model, floor)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept == realIds, "the batch gate keeps exactly the real docs")
    val rejects = StreamOps.lmFilter(gated, "text", model, floor, keepBelow = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rejects == junkIds, "keepBelow audits exactly the gibberish")

    val rows = gated.as[Doc].collect().toSeq.sortBy(_.doc_id)
    val mem = MemoryStream[Doc]
    val q = StreamOps.lmFilter(mem.toDF(), "text", model, floor)
      .writeStream.format("memory").queryName("t_lm").outputMode("append").start()
    try {
      rows.grouped(rows.size / 3 + 1).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("t_lm")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batchKept, "stream replay must emit the batch survivors")
      val ops = q.lastProgress.stateOperators
      assert(ops == null || ops.isEmpty,
        s"expected no state operators, got ${ops.mkString(",")}")
    } finally q.stop()
  }

  test("mixSources is stream-ready: replay emits the batch draw, zero state") {
    // The mixture filter is a pure projection (content-hash acceptance),
    // so the SAME Pipelines.mixSources call runs on an unbounded stream
    // with no state — the data-mixing step composes with the loops.
    val docs = TestSpark.table("documents").select("doc_id", "text", "source")
    val rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25)
    val batchKept = graft.api.Pipelines.mixSources(docs, "source", "doc_id", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept.nonEmpty)
    val rows = docs.as[SrcDoc].collect().toSeq.sortBy(_.doc_id)
    val mem = MemoryStream[SrcDoc]
    val q = graft.api.Pipelines.mixSources(mem.toDF(), "source", "doc_id", rates)
      .writeStream.format("memory").queryName("t_mix").outputMode("append").start()
    try {
      rows.grouped(rows.size / 3 + 1).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("t_mix")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batchKept, "stream replay must emit the batch draw")
      val ops = q.lastProgress.stateOperators
      assert(ops == null || ops.isEmpty,
        s"expected no state operators, got ${ops.mkString(",")}")
    } finally q.stop()
  }

  test("null and too-short text score null and fail the gate in both directions") {
    val d = Seq((1L, null.asInstanceOf[String]), (2L, "ab"), (3L, "")).toDF("doc_id", "text")
    val bytes = TextOps.ngramModelBytes(model)
    assert(d.select(TextOps.lmScore(col("text"), bytes).as("s"))
      .where(col("s").isNotNull).count() == 0)
    assert(StreamOps.lmFilter(d, "text", model, -100.0).count() == 0)
    assert(StreamOps.lmFilter(d, "text", model, -100.0, keepBelow = true).count() == 0)
  }
}
