package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.DedupOps

/** The closed streaming dedup loop must equal the batch q91 chain run
  * stage by stage — including across a mid-stream restart — and its
  * per-batch writes must be replay-idempotent. */
class DedupLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs = TestSpark.table("documents").select("doc_id", "text")

  test("dedup loop with manifest: survivor lake stays pruning-ready as it grows") {
    import graft.sources.{ColumnBounds, FileStats}
    val root = Files.createTempDirectory("graft-deduploop-manifest").toString
    val (src, out, state, mstate, ckpt) =
      (s"$root/src", s"$root/out", s"$root/state", s"$root/mstate", s"$root/ckpt")
    val stage1 = docs.where(col("doc_id") < 150)
    val stage2 = docs.where(col("doc_id") >= 150)

    def runOnce(): Unit = {
      val q = DedupLoop.run(
        spark.readStream.schema(docs.schema).parquet(src),
        "doc_id", "text", state, out, ckpt,
        trigger = Some(Trigger.AvailableNow()),
        manifest = Some((Seq("doc_id"), mstate)))
      q.awaitTermination(120000)
      q.stop()
    }
    stage1.write.mode("append").parquet(src)
    runOnce() // STOP — mid-stream restart
    stage2.write.mode("append").parquet(src)
    runOnce()

    val manifest = ManifestLoop.latestManifest(spark, mstate).get
    // The streamed manifest describes the survivor lake exactly.
    def canon(df: DataFrame) = df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(canon(manifest) == canon(FileStats.collect(spark, out, Seq("doc_id"))))
    // And prunes correctly over it.
    val bounds = Seq(ColumnBounds("doc_id", Some(0L), Some(100L)))
    val got = FileStats.prunedRead(spark, out, manifest, bounds)
    val want = spark.read.parquet(out).where(col("doc_id").between(0L, 100L))
    assert(canon(got.drop("batch")) == canon(want.drop("batch")) && got.count() > 0)
  }

  test("an ALL-duplicates batch leaves the manifest-composed lake pruning-ready (r5 advice)") {
    import graft.sources.{ColumnBounds, FileStats}
    val root = Files.createTempDirectory("graft-deduploop-alldup").toString
    val (out, state, mstate) = (s"$root/out", s"$root/state", s"$root/mstate")
    val batch = docs.where(col("doc_id") < 100)
    val m = Some((Seq("doc_id"), mstate))
    DedupLoop.dedupBatch(batch, 0L, "doc_id", "text", state, out, 8, m)
    // Batch 1 re-feeds the SAME texts under LARGER ids: every doc loses to
    // its batch-0 keeper — zero survivors. Spark still writes a
    // schema-bearing empty part file under batch=1 — the manifest fold
    // must represent it or prunedRead's staleness guard trips forever.
    DedupLoop.dedupBatch(batch.withColumn("doc_id", col("doc_id") + 100000L),
      1L, "doc_id", "text", state, out, 8, m)
    val b1 = new java.io.File(s"$out/batch=1").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(b1 >= 1, "expected an empty part file under batch=1 — scenario not exercised")
    assert(spark.read.parquet(s"$out/batch=1").count() == 0)

    val manifest = ManifestLoop.latestManifest(spark, mstate).get
    def canon(df: DataFrame) = df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(canon(manifest) == canon(FileStats.collect(spark, out, Seq("doc_id"))))
    val bounds = Seq(ColumnBounds("doc_id", Some(0L), Some(50L)))
    val got = FileStats.prunedRead(spark, out, manifest, bounds)
    val want = spark.read.parquet(out).where(col("doc_id").between(0L, 50L))
    assert(canon(got.drop("batch")) == canon(want.drop("batch")) && got.count() > 0)
  }

  test("two-stage run with restart equals the batch q91 chain run twice") {
    val root = Files.createTempDirectory("graft-deduploop").toString
    val (src, out, state, ckpt) =
      (s"$root/src", s"$root/out", s"$root/state", s"$root/ckpt")

    val seed = DedupOps.fingerprintTable(
      docs.where(col("doc_id") < 100), col("doc_id"), col("text"))
    val stage1 = docs.where(col("doc_id") >= 100 && col("doc_id") < 200)
    val stage2 = docs.where(col("doc_id") >= 200)

    // Batch truth: the q91 chain — decide stage1 vs seed, fold, decide
    // stage2 vs the folded state.
    val keep1 = DedupOps.incrementalDedup(stage1, col("doc_id"), col("text"), seed)
      .where(!col("is_dup")).select("doc_id").collect().map(_.getLong(0)).toSet
    val state1 = DedupOps.updatedFingerprints(seed, stage1, col("doc_id"), col("text"))
    val keep2 = DedupOps.incrementalDedup(stage2, col("doc_id"), col("text"), state1)
      .where(!col("is_dup")).select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = keep1 ++ keep2
    assert(keep1.nonEmpty && keep2.nonEmpty, "vacuous stages")

    DedupLoop.seedState(seed, state)
    def runOnce(): Unit = {
      val q = DedupLoop.run(
        spark.readStream.schema(docs.schema).parquet(src),
        "doc_id", "text", state, out, ckpt,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination(120000)
      q.stop()
    }

    // Stage 1, then STOP (the mid-stream restart), then stage 2.
    stage1.write.mode("append").parquet(src)
    runOnce()
    val afterStage1 = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterStage1 == keep1, s"stage1 survivors ${afterStage1.size} != batch ${keep1.size}")

    stage2.write.mode("append").parquet(src)
    runOnce()
    val survivors = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == expect,
      s"loop survivors ${survivors.size} != batch chain ${expect.size}")

    // The folded state equals the batch chain's state after both stages.
    val loopState = DedupLoop.latestState(spark, state)
    val chainState = DedupOps.updatedFingerprints(state1, stage2, col("doc_id"), col("text"))
    def canon(df: DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(canon(loopState) == canon(chainState))

    // GC ran: versions no replay can need are gone (only the version each
    // live batch read, plus the latest, may remain).
    val versions = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith("v")).map(_.getName).sorted.toSeq
    assert(versions.size <= 2, s"stale state versions survived GC: $versions")
  }

  test("replaying a batch (crash before checkpoint commit) is idempotent") {
    val root = Files.createTempDirectory("graft-deduploop-rp").toString
    val (out, state) = (s"$root/out", s"$root/state")
    val batch = docs.where(col("doc_id") < 150)

    DedupLoop.dedupBatch(batch, 0L, "doc_id", "text", state, out, 8)
    val firstOut = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val firstState = spark.read.parquet(s"$state/v1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq

    // Replay the SAME batch id: output and state must be rewritten, not
    // duplicated or drifted.
    DedupLoop.dedupBatch(batch, 0L, "doc_id", "text", state, out, 8)
    val secondOut = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val secondState = spark.read.parquet(s"$state/v1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(secondOut == firstOut && secondState == firstState)
    assert(firstOut.nonEmpty)
  }

  test("takedowns: retracting a keeper re-opens its signature; non-keepers are no-ops") {
    val spark2 = spark
    import spark2.implicits._
    val root = Files.createTempDirectory("graft-deduploop-rt").toString
    val (out, state) = (s"$root/out", s"$root/state")
    def fold(rows: Seq[(Long, String, Boolean)], id: Long): Unit =
      DedupLoop.dedupBatch(rows.toDF("doc_id", "text", "removed"), id,
        "doc_id", "text", state, out, 8, removedCol = "removed")
    def survivors(id: Long): Seq[Long] =
      spark.read.parquet(s"$out/batch=$id").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
    def keeperOf(text: String): Option[Long] = {
      val sig = DedupOps.sigKeysFast(Seq((0L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), 8).select("sigkey").head().getString(0)
      DedupLoop.latestState(spark, state).where(col("sigkey") === sig)
        .collect().headOption.map(_.getLong(1))
    }
    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "an entirely different document about spark engines and data"
    // b0: A (keeper) + its dup; B.
    fold(Seq((1L, textA, false), (2L, textA, false), (10L, textB, false)), 0L)
    assert(survivors(0L) == Seq(1L, 10L) && keeperOf(textA).contains(1L))
    // b1: RETRACT the keeper; a same-batch duplicate of the retracted
    // content must be admitted FRESH (retraction applies before the
    // batch competes). Retraction rows carry no usable text.
    fold(Seq((1L, null, true), (3L, textA, false)), 1L)
    assert(survivors(1L) == Seq(3L), "post-retraction duplicate must be admitted")
    assert(keeperOf(textA).contains(3L), "the signature re-anchors on the new doc")
    // b2: later duplicates drop against the NEW keeper; retracting a
    // doc that anchors nothing (2 was always a dup) is a state no-op.
    fold(Seq((4L, textA, false), (2L, null, true)), 2L)
    assert(survivors(2L).isEmpty)
    assert(keeperOf(textA).contains(3L) && keeperOf(textB).contains(10L))
    // Replay of the retraction batch is idempotent.
    fold(Seq((1L, null, true), (3L, textA, false)), 1L)
    assert(survivors(1L) == Seq(3L))
  }
}
