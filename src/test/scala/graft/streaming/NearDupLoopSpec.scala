package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.DedupOps

final case class NdEvent(doc_id: Long, text: String, removed: Boolean)

/** The streaming near-dup pair discoverer must emit EXACTLY the batch
  * `minhashLshDocs(all docs)` pair set across micro-batches — each pair
  * once, in the batch of its later doc, genesis included — stay
  * content-stable under crash replay, and honor takedowns before the
  * batch's additions pair. */
class NearDupLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def documents = TestSpark.table("documents")

  private val (k, bands, tau) = (8, 4, 0.8)

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def oneShot(docs: DataFrame): Set[(Long, Long)] =
    pairsOf(DedupOps.minhashLshDocs(docs, col("doc_id"), col("text"), k, bands, tau))

  private def drop(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS `${t}_bk`")
    spark.sql(s"DROP TABLE IF EXISTS `${t}_tk`")
  }

  test("genesis + folds emit exactly the one-shot pair set; replay is content-stable") {
    val all = documents.where(col("doc_id") < 300)
      .select("doc_id", "text").localCheckpoint()
    val batches = Seq(
      all.where(col("doc_id") < 100),
      all.where(col("doc_id") >= 100 && col("doc_id") < 200),
      all.where(col("doc_id") >= 200))
    val root = Files.createTempDirectory("graft-nduploop").toString
    val (idx, out) = (s"$root/idx", s"$root/out")
    try {
      def fold(i: Int): Unit =
        NearDupLoop.foldBatch(batches(i), i.toLong, "doc_id", "text", "",
          "ndl_a", idx, out, k, bands, tau, buckets = 4)
      fold(0)
      // Genesis crash replay (the only replay Spark performs is of the
      // LAST, possibly-uncommitted batch): batch 0 re-runs against an
      // index that already holds it — identical pairs, no re-append.
      val gen0 = pairsOf(spark.read.parquet(s"$out/batch=0"))
      val (_, toks0) = DedupOps.loadNearDupIndex(spark, "ndl_a", idx, buckets = 4)
      val phys0 = toks0.count()
      fold(0)
      assert(pairsOf(spark.read.parquet(s"$out/batch=0")) == gen0,
        "genesis replay must rewrite identical pairs")
      assert(toks0.count() == phys0, "genesis replay must not re-append")
      fold(1); fold(2)
      val perBatch = (0 to 2).map(i => pairsOf(spark.read.parquet(s"$out/batch=$i")))
      val want = oneShot(all)
      assert(perBatch.map(_.size).sum == perBatch.reduce(_ ++ _).size,
        "a pair must surface exactly once")
      assert(perBatch.reduce(_ ++ _) == want,
        s"fold diverged: extra=${perBatch.reduce(_ ++ _) -- want} " +
          s"missing=${want -- perBatch.reduce(_ ++ _)}")
      // Every pair lands in the batch of its LATER doc (genesis pairs
      // are batch-0-internal by construction).
      assert(perBatch(0).forall(_._2 < 100))
      assert(perBatch(1).forall(p => p._2 >= 100 && p._2 < 200))
      assert(perBatch(2).forall(_._2 >= 200))
      assert(perBatch(1).nonEmpty && perBatch(2).nonEmpty,
        "fixture must produce cross-batch pairs")
      // Crash replay of the LAST applied batch: identical output, no
      // duplicate index rows.
      val (_, toks) = DedupOps.loadNearDupIndex(spark, "ndl_a", idx, buckets = 4)
      val physBefore = toks.count()
      fold(2)
      assert(pairsOf(spark.read.parquet(s"$out/batch=2")) == perBatch(2),
        "replayed batch must rewrite identical pairs")
      assert(toks.count() == physBefore, "replay must not re-append the batch")
    } finally drop("ndl_a")
  }

  test("takedowns stop pairing; same-batch remove+add resolves to deleted") {
    val spark2 = spark
    import spark2.implicits._
    val all = documents.where(col("doc_id") < 200)
      .select("doc_id", "text").localCheckpoint()
    val b0 = all.where(col("doc_id") < 100)
    val b1 = all.where(col("doc_id") >= 100)
    val want = oneShot(all)
    val victim = want.collectFirst {
      case (o, n) if o < 100 && n >= 100 => o
    }.getOrElse(fail("fixture must have a cross-batch pair"))
    val root = Files.createTempDirectory("graft-nduploop-rm").toString
    val (idx, out) = (s"$root/idx", s"$root/out")
    try {
      NearDupLoop.seedIndex(b0, "doc_id", "text", "ndl_b", idx, k, bands, buckets = 4)
      // Batch 1 carries b1's additions, a takedown of the victim, and a
      // doc (id 900) that is added AND removed in the same batch.
      val ev = b1.select(col("doc_id"), col("text"), lit(false).as("removed"))
        .unionByName(Seq(
          NdEvent(victim, null, removed = true),
          NdEvent(900L, "remove and add in one batch", removed = false),
          NdEvent(900L, null, removed = true)).toDF())
      NearDupLoop.foldBatch(ev, 0L, "doc_id", "text", "removed",
        "ndl_b", idx, out, k, bands, tau, buckets = 4)
      val got = pairsOf(spark.read.parquet(s"$out/batch=0"))
      val expected = want.filter(p => p._2 >= 100)
        .filterNot(p => p._1 == victim || p._2 == victim)
      assert(got == expected,
        s"extra=${got -- expected} missing=${expected -- got}")
      assert(want.exists(p => (p._1 == victim || p._2 == victim) && p._2 >= 100),
        "the takedown must be observable")
      // The same-batch remove+add doc never entered the index; the victim
      // is tombstoned, not physically gone.
      val (_, toks) = DedupOps.loadNearDupIndex(spark, "ndl_b", idx, buckets = 4)
      assert(toks.where(col("doc_id") === 900L).count() == 0L)
      assert(toks.where(col("doc_id") === victim).count() == 1L)
      val (_, liveToks) = DedupOps.loadNearDupIndexLive(spark, "ndl_b", idx, buckets = 4)
      assert(liveToks.where(col("doc_id") === victim).count() == 0L)
      // CROSS-batch re-add of the tombstoned victim (mixed with a fresh
      // doc): the re-add resolves to deleted — dropped from the batch, no
      // pairs emitted for it, the fresh doc processed normally, and the
      // loop does NOT wedge on the all-or-none presence guard (the
      // victim's physical rows still exist).
      val readd = all.where(col("doc_id") === victim)
        .select(col("doc_id"), col("text"), lit(false).as("removed"))
        .unionByName(Seq(NdEvent(901L, "a fresh doc arriving alongside the readd",
          removed = false)).toDF())
      NearDupLoop.foldBatch(readd, 1L, "doc_id", "text", "removed",
        "ndl_b", idx, out, k, bands, tau, buckets = 4)
      val got1 = pairsOf(spark.read.parquet(s"$out/batch=1"))
      assert(!got1.exists(p => p._1 == victim || p._2 == victim),
        "a tombstoned id's re-add must stay deleted until compaction")
      val (_, toksAfter) = DedupOps.loadNearDupIndex(spark, "ndl_b", idx, buckets = 4)
      assert(toksAfter.where(col("doc_id") === victim).count() == 1L,
        "the re-add must not append a second physical row")
      assert(toksAfter.where(col("doc_id") === 901L).count() == 1L,
        "the fresh doc in the mixed batch must ingest normally")
    } finally drop("ndl_b")
  }

  test("run() end-to-end over a MemoryStream matches the one-shot pair set") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = documents.where(col("doc_id") < 200)
      .select("doc_id", "text").localCheckpoint()
    val docs = all.as[(Long, String)].collect().sortBy(_._1)
      .map { case (i, t) => NdEvent(i, t, removed = false) }
    val root = Files.createTempDirectory("graft-nduploop-run").toString
    val mem = MemoryStream[NdEvent]
    val q = NearDupLoop.run(mem.toDF(), "doc_id", "text", "removed",
      "ndl_c", s"$root/idx", s"$root/out", s"$root/ckpt",
      k, bands, tau, buckets = 4)
    try {
      docs.grouped(docs.length / 2 + 1).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      assert(pairsOf(spark.read.parquet(s"$root/out")) == oneShot(all))
    } finally { q.stop(); drop("ndl_c") }
  }
}
