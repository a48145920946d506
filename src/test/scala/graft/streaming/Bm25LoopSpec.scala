package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.SketchOps

final case class BmEvent(doc_id: Long, text: String, removed: Boolean)

/** The streaming BM25 loop must keep the inverted index EXACT: between
  * any two triggers, the indexed query equals the ad-hoc ranker over
  * everything ingested-and-not-retracted so far; replay must not
  * double-count postings or stats; takedowns correct df/avgdl, not just
  * hide rows. */
class Bm25LoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def documents = TestSpark.table("documents")

  private val terms = Seq("data", "stream")

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def adHoc(d: DataFrame): Map[Long, Double] =
    graft.api.Pipelines.bm25Rank(d, col("doc_id"), col("text"), terms)
      .collect().map(r => r.getLong(0) -> round6(r.getDouble(1))).toMap

  private def indexed(tbl: String, path: String): Map[Long, Double] =
    SketchOps.bm25QueryIndexed(spark, tbl, path, terms, buckets = 4)
      .collect().map(r => r.getLong(0) -> round6(r.getDouble(1))).toMap

  private def drop(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS `${t}_po`")
    spark.sql(s"DROP TABLE IF EXISTS `${t}_dl`")
  }

  test("genesis + folds keep indexed ≡ ad-hoc at every trigger; replay is content-stable") {
    val all = documents.where(col("doc_id") < 300)
      .select("doc_id", "text").localCheckpoint()
    val batches = Seq(
      all.where(col("doc_id") < 100),
      all.where(col("doc_id") >= 100 && col("doc_id") < 200),
      all.where(col("doc_id") >= 200))
    val root = Files.createTempDirectory("graft-bm25loop").toString
    val (st, out) = (s"$root/idx", s"$root/out")
    try {
      def fold(i: Int): Unit =
        Bm25Loop.foldBatch(batches(i), i.toLong, "doc_id", "text", "",
          "bml_a", st, out, buckets = 4)
      fold(0)
      assert(indexed("bml_a", st) == adHoc(batches(0)))
      // Genesis crash replay: identical state and snapshot.
      val stats0 = SketchOps.bm25Stats(spark, st)
      fold(0)
      assert(SketchOps.bm25Stats(spark, st) == stats0,
        "genesis replay must not double-count stats")
      assert(indexed("bml_a", st) == adHoc(batches(0)))
      fold(1)
      assert(indexed("bml_a", st) ==
        adHoc(batches(0).unionByName(batches(1))),
        "mid-stream query must equal the ad-hoc ranker over ingested docs")
      fold(2)
      assert(indexed("bml_a", st) == adHoc(all))
      // Replay of the last applied batch: stats and scores unchanged.
      val statsAll = SketchOps.bm25Stats(spark, st)
      fold(2)
      assert(SketchOps.bm25Stats(spark, st) == statsAll,
        "replay must not double-count postings or stats")
      assert(indexed("bml_a", st) == adHoc(all))
      // Snapshot observability: per-batch live scalars accumulate.
      val snap = spark.read.parquet(s"$out/batch=2").head()
      assert(snap.getLong(1) == all.count())
    } finally drop("bml_a")
  }

  test("takedowns correct the statistics; same-batch remove+add resolves to deleted") {
    val spark2 = spark
    import spark2.implicits._
    val all = documents.where(col("doc_id") < 200)
      .select("doc_id", "text").localCheckpoint()
    val b0 = all.where(col("doc_id") < 100)
    val b1 = all.where(col("doc_id") >= 100)
    val victim = adHoc(b0).keySet.min
    val root = Files.createTempDirectory("graft-bm25loop-rm").toString
    val (st, out) = (s"$root/idx", s"$root/out")
    try {
      Bm25Loop.seedIndex(b0, "doc_id", "text", "bml_b", st, buckets = 4)
      val ev = b1.select(col("doc_id"), col("text"), lit(false).as("removed"))
        .unionByName(Seq(
          BmEvent(victim, null, removed = true),
          BmEvent(900L, "data stream data", removed = false),
          BmEvent(900L, null, removed = true)).toDF())
      Bm25Loop.foldBatch(ev, 0L, "doc_id", "text", "removed",
        "bml_b", st, out, buckets = 4)
      val got = indexed("bml_b", st)
      assert(!got.contains(victim) && !got.contains(900L))
      // The strong contract: scores equal the ad-hoc ranker over the
      // SURVIVING corpus — df and avgdl absorbed the takedown.
      assert(got == adHoc(all.where(col("doc_id") =!= victim)),
        "takedown must correct df/avgdl, not just hide rows")
    } finally drop("bml_b")
  }

  test("run() end-to-end over a MemoryStream matches the ad-hoc ranker") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = documents.where(col("doc_id") < 200)
      .select("doc_id", "text").localCheckpoint()
    val docs = all.as[(Long, String)].collect().sortBy(_._1)
      .map { case (i, t) => BmEvent(i, t, removed = false) }
    val root = Files.createTempDirectory("graft-bm25loop-run").toString
    val mem = MemoryStream[BmEvent]
    val q = Bm25Loop.run(mem.toDF(), "doc_id", "text", "removed",
      "bml_c", s"$root/idx", s"$root/out", s"$root/ckpt", buckets = 4)
    try {
      docs.grouped(docs.length / 2 + 1).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      assert(indexed("bml_c", s"$root/idx") == adHoc(all))
    } finally { q.stop(); drop("bml_c") }
  }
}
