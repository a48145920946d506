package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.Ann

final case class AnnEvent(vec_id: Long, embedding: Seq[Float], removed: Boolean)

/** The streaming ANN-index loop must fold arriving vectors into a
  * persisted IVF index that EQUALS the fresh batch build, report
  * per-cluster growth against the pre-batch state (replay-stable), keep
  * search live between triggers, and honor takedowns before additions
  * append. */
class AnnLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def embeddings = TestSpark.table("embeddings")

  private def idx(df: DataFrame): Set[(Long, Long, Seq[Byte])] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Byte](2))).toSet

  private def drop(tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))

  test("genesis + folds build exactly the fresh index; reports replay-stable") {
    val all = embeddings.localCheckpoint()
    val cents = all.where(col("vec_id") < 8).localCheckpoint()
    val batches = Seq(
      all.where(col("vec_id") < 200),
      all.where(col("vec_id") >= 200 && col("vec_id") < 350),
      all.where(col("vec_id") >= 350))
    val root = Files.createTempDirectory("graft-annloop").toString
    val (st, out) = (s"$root/idx", s"$root/out")
    try {
      def fold(i: Int): Unit =
        AnnLoop.foldBatch(batches(i), i.toLong, "vec_id", "embedding", "",
          cents, "annl_a", st, out, buckets = 4)
      fold(0)
      // Genesis crash replay: identical report, no re-append.
      val rep0 = spark.read.parquet(s"$out/batch=0")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val n0 = Ann.loadIvfIndex(spark, "annl_a", st, buckets = 4).count()
      fold(0)
      assert(spark.read.parquet(s"$out/batch=0")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == rep0,
        "genesis replay must rewrite the identical report")
      assert(Ann.loadIvfIndex(spark, "annl_a", st, buckets = 4).count() == n0)
      fold(1); fold(2)
      // Folded index ≡ fresh build over the whole gallery.
      assert(idx(Ann.loadIvfIndex(spark, "annl_a", st, buckets = 4)) ==
        idx(Ann.ivfIndex(all, cents)),
        "folded index must equal the fresh batch build")
      // Reports: prior counts accumulate; batch-2 prior ≡ batches 0+1.
      val rep2 = spark.read.parquet(s"$out/batch=2")
      assert(rep2.agg(sum("prior_n")).head().getLong(0) ==
        batches(0).count() + batches(1).count())
      assert(rep2.agg(sum("appended_n")).head().getLong(0) == batches(2).count())
      // Replay of the last applied batch: identical report, no re-append.
      val r2 = rep2.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val nAll = Ann.loadIvfIndex(spark, "annl_a", st, buckets = 4).count()
      fold(2)
      assert(spark.read.parquet(s"$out/batch=2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == r2,
        "replayed batch must rewrite the identical report")
      assert(Ann.loadIvfIndex(spark, "annl_a", st, buckets = 4).count() == nAll,
        "replay must not re-append")
    } finally drop("annl_a")
  }

  test("takedowns stop retrieval; same-batch remove+add resolves to deleted; search live") {
    val spark2 = spark
    import spark2.implicits._
    val all = embeddings.localCheckpoint()
    val cents = all.where(col("vec_id") < 8).localCheckpoint()
    val root = Files.createTempDirectory("graft-annloop-rm").toString
    val (st, out) = (s"$root/idx", s"$root/out")
    try {
      AnnLoop.seedIndex(all.where(col("vec_id") < 300), cents, "annl_b", st,
        buckets = 4)
      // Batch: additions 300+, takedown of 42, and 900 added+removed.
      val v900 = all.where(col("vec_id") === 0)
        .select(lit(900L).as("vec_id"), col("embedding")).as[(Long, Seq[Float])]
        .head()
      val ev = all.where(col("vec_id") >= 300)
        .select(col("vec_id"), col("embedding"), lit(false).as("removed"))
        .unionByName(Seq(
          AnnEvent(42L, null, removed = true),
          AnnEvent(900L, v900._2, removed = false),
          AnnEvent(900L, null, removed = true)).toDF())
      AnnLoop.foldBatch(ev, 0L, "vec_id", "embedding", "removed",
        cents, "annl_b", st, out, buckets = 4)
      val phys = Ann.loadIvfIndex(spark, "annl_b", st, buckets = 4)
      val live = Ann.loadIvfIndexLive(spark, "annl_b", st, buckets = 4)
      assert(phys.where(col("g_id") === 900L).count() == 0L,
        "same-batch remove+add must resolve to deleted")
      assert(phys.where(col("g_id") === 42L).count() == 1L &&
        live.where(col("g_id") === 42L).count() == 0L,
        "the victim is tombstoned, not physically gone")
      // Search is live over the grown index: a new vector is its own
      // nearest neighbor; the victim is unreachable.
      val probe = all.where(col("vec_id") === 350)
      val got = Ann.topKQuantizedIvfWithIndex(probe, live,
        all.join(live.select("g_id"), col("vec_id") === col("g_id"), "left_semi"),
        cents, k = 3).collect().map(_.getLong(1)).toSet
      assert(got.contains(350L), "a folded vector must be retrievable")
      assert(!got.contains(42L))
    } finally drop("annl_b")
  }

  test("run() end-to-end over a MemoryStream equals the fresh build") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = embeddings.where(col("vec_id") < 300).localCheckpoint()
    val cents = all.where(col("vec_id") < 8).localCheckpoint()
    val docs = all.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().sortBy(_._1)
      .map { case (i, v) => AnnEvent(i, v, removed = false) }
    val root = Files.createTempDirectory("graft-annloop-run").toString
    val mem = MemoryStream[AnnEvent]
    val q = AnnLoop.run(mem.toDF(), "vec_id", "embedding", "removed",
      cents, "annl_c", s"$root/idx", s"$root/out", s"$root/ckpt", buckets = 4)
    try {
      docs.grouped(docs.length / 2 + 1).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      assert(idx(Ann.loadIvfIndex(spark, "annl_c", s"$root/idx", buckets = 4)) ==
        idx(Ann.ivfIndex(all, cents)))
    } finally { q.stop(); drop("annl_c") }
  }
}
