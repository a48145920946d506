package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.Ann

final case class SdEvent(vec_id: Long, embedding: Seq[Float], removed: Boolean)

/** The streaming SemDeDup verdict loop must emit EXACTLY the batch
  * `semDedupDrops(all docs)` drop set across micro-batches — each drop
  * once, in the batch of its doc, genesis included — stay
  * content-stable under crash replay, and honor takedowns before the
  * batch's additions are judged. */
class SemDedupLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def embeddings = TestSpark.table("embeddings")

  import scala.jdk.CollectionConverters._
  private val embSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("vec_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("embedding",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))))

  private def embDf(rows: (Long, Seq[Float])*) =
    spark.createDataFrame(
      rows.map { case (i, v) => org.apache.spark.sql.Row(i, v) }.asJava, embSchema)

  private def at(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  private def drop(tables: String*): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))

  test("genesis + folds emit exactly the one-shot drop set; replay is content-stable") {
    val all = embeddings.where(col("vec_id") < 150).localCheckpoint()
    val batches = Seq(
      all.where(col("vec_id") < 50),
      all.where(col("vec_id") >= 50 && col("vec_id") < 100),
      all.where(col("vec_id") >= 100))
    val cents = Ann.kmeans(all, 4, iters = 2).localCheckpoint()
    val tau = 0.35
    val root = Files.createTempDirectory("graft-sdloop").toString
    val (st, out) = (s"$root/st", s"$root/out")
    try {
      def fold(i: Int): Unit =
        SemDedupLoop.foldBatch(batches(i), i.toLong, "vec_id", "embedding", "",
          cents, "sdl_a", st, out, tau, buckets = 4)
      fold(0)
      // Genesis crash replay: batch 0 re-runs against a state that
      // already holds it — identical verdicts, no re-append.
      val gen0 = ids(spark.read.parquet(s"$out/batch=0"))
      val phys0 = Ann.loadSemDedupState(spark, "sdl_a", st, buckets = 4).count()
      fold(0)
      assert(ids(spark.read.parquet(s"$out/batch=0")) == gen0,
        "genesis replay must rewrite identical verdicts")
      assert(Ann.loadSemDedupState(spark, "sdl_a", st, buckets = 4).count() == phys0,
        "genesis replay must not re-append")
      fold(1); fold(2)
      val perBatch = (0 to 2).map(i => ids(spark.read.parquet(s"$out/batch=$i")))
      val want = Ann.semDedupDrops(all, cents, tau)
        .collect().map(_.getLong(0)).toSet
      assert(perBatch.map(_.size).sum == perBatch.reduce(_ ++ _).size,
        "a verdict must surface exactly once")
      assert(perBatch.reduce(_ ++ _) == want,
        s"fold diverged: extra=${perBatch.reduce(_ ++ _) -- want} " +
          s"missing=${want -- perBatch.reduce(_ ++ _)}")
      // Every verdict lands in its own doc's batch.
      assert(perBatch(0).forall(_ < 50))
      assert(perBatch(1).forall(i => i >= 50 && i < 100))
      assert(perBatch(2).forall(_ >= 100))
      assert(perBatch(1).nonEmpty && perBatch(2).nonEmpty,
        "fixture must produce cross-batch drops")
      // Crash replay of the LAST applied batch: identical output, no
      // duplicate state rows.
      val physBefore = Ann.loadSemDedupState(spark, "sdl_a", st, buckets = 4).count()
      fold(2)
      assert(ids(spark.read.parquet(s"$out/batch=2")) == perBatch(2),
        "replayed batch must rewrite identical verdicts")
      assert(Ann.loadSemDedupState(spark, "sdl_a", st, buckets = 4).count() == physBefore,
        "replay must not re-append the batch")
    } finally drop("sdl_a")
  }

  test("takedowns stop dominating; same-batch remove+add resolves to deleted") {
    val spark2 = spark
    import spark2.implicits._
    // Single cluster at 0 deg; tau = 0.9. Seed: 10 (0 deg), 11 (50 deg).
    val cents = embDf(0L -> at(0))
    val tau = 0.9
    val root = Files.createTempDirectory("graft-sdloop-rm").toString
    val (st, out) = (s"$root/st", s"$root/out")
    try {
      SemDedupLoop.seedState(embDf(10L -> at(0), 11L -> at(50)), cents,
        "vec_id", "embedding", "sdl_b", st, buckets = 4)
      // Batch: 20 (3 deg — twin of the taken-down 10), 21 (47 deg — twin
      // of the LIVE 11), takedown of 10, and 30 added+removed in-batch.
      val ev = Seq(
        SdEvent(20L, at(3), removed = false),
        SdEvent(21L, at(47), removed = false),
        SdEvent(10L, null, removed = true),
        SdEvent(30L, at(0), removed = false),
        SdEvent(30L, null, removed = true)).toDF()
      SemDedupLoop.foldBatch(ev, 0L, "vec_id", "embedding", "removed",
        cents, "sdl_b", st, out, tau, buckets = 4)
      val got = ids(spark.read.parquet(s"$out/batch=0"))
      assert(got == Set(21L),
        s"20 must be admitted (its only dominator was taken down), 30 resolves " +
          s"to deleted, 21 drops vs the live 11 — got $got")
      // The same-batch remove+add doc never entered the state; the victim
      // is tombstoned, not physically gone.
      val phys = Ann.loadSemDedupState(spark, "sdl_b", st, buckets = 4)
      val live = Ann.loadSemDedupStateLive(spark, "sdl_b", st, buckets = 4)
      assert(phys.where(col("doc_id") === 30L).count() == 0L)
      assert(phys.where(col("doc_id") === 10L).count() == 1L)
      assert(live.where(col("doc_id") === 10L).count() == 0L)
      assert(ids(live.select("doc_id")) == Set(11L, 20L, 21L))
    } finally drop("sdl_b")
  }

  test("run() end-to-end over a MemoryStream matches the one-shot drop set") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = embeddings.where(col("vec_id") < 100).localCheckpoint()
    val cents = Ann.kmeans(all, 4, iters = 2).localCheckpoint()
    val tau = 0.35
    val docs = all.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
      .map { case (i, v) => SdEvent(i, v, removed = false) }
    val root = Files.createTempDirectory("graft-sdloop-run").toString
    val mem = MemoryStream[SdEvent]
    val q = SemDedupLoop.run(mem.toDF(), "vec_id", "embedding", "removed",
      cents, "sdl_c", s"$root/st", s"$root/out", s"$root/ckpt",
      tau, buckets = 4)
    try {
      docs.grouped(docs.length / 2 + 1).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      val want = Ann.semDedupDrops(all, cents, tau)
        .collect().map(_.getLong(0)).toSet
      assert(ids(spark.read.parquet(s"$root/out")) == want)
    } finally { q.stop(); drop("sdl_c") }
  }
}
