package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.{ColumnBounds, FileStats, Maintenance}

/** The streamed CDC apply must leave the table equal to the sequential
  * batch merges at every point — across genesis, a mid-stream restart,
  * delete markers, same-batch replay (which exercises the stale-manifest
  * repair path by construction), and out-of-band table mutation. */
class UpsertLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def orders = TestSpark.table("orders")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  private def mark(df: DataFrame, del: Boolean): DataFrame =
    df.withColumn("__del", lit(del))

  test("CDC stream with restart: genesis, merge, deletes ≡ sequential merges") {
    val root = Files.createTempDirectory("graft-upsertloop").toString
    val (src, dir, state, ckpt) = (s"$root/src", s"$root/t", s"$root/state", s"$root/ckpt")
    val base = orders.where(col("o_orderkey") < 800).localCheckpoint()

    def runOnce(): Unit = {
      val q = UpsertLoop.run(
        spark.readStream.schema(mark(base, del = false).schema).parquet(src),
        dir, "o_orderkey", state, ckpt, deleteCol = Some("__del"),
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination(120000)
      q.stop()
    }

    // Stage 1 — genesis: the first batch IS the table.
    mark(base, del = false).write.mode("append").parquet(src)
    runOnce() // STOP — mid-stream restart
    assert(canon(spark.read.parquet(dir)) == canon(base))

    // Stage 2 — updates (narrow key slice), inserts (new keys), deletes.
    val updates = base.where(col("o_orderkey").between(100L, 120L))
      .withColumn("o_totalprice", lit(0.0)).localCheckpoint()
    val inserts = base.where(col("o_orderkey") < 3)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000L).localCheckpoint()
    val delRows = base.where(col("o_orderkey").isin(130L, 131L))
    mark(updates.unionByName(inserts), del = false)
      .unionByName(mark(delRows, del = true))
      .write.mode("append").parquet(src)
    runOnce()

    val changeKeys = updates.select("o_orderkey")
      .union(inserts.select("o_orderkey")).union(delRows.select("o_orderkey"))
    val want = base.join(changeKeys, Seq("o_orderkey"), "left_anti")
      .unionByName(updates).unionByName(inserts)
    assert(canon(spark.read.parquet(dir)) == canon(want))

    // Manifest state tracks the table exactly: fresh, and prunable.
    val m = UpsertLoop.latestManifest(spark, state).get
    assert(FileStats.isFresh(spark, dir, m))
    val got = FileStats.prunedRead(spark, dir, m,
      Seq(ColumnBounds("o_orderkey", Some(100L), Some(120L))))
    assert(got.count() > 0 &&
      got.agg(sum(col("o_totalprice"))).head().getDouble(0) == 0.0)
  }

  test("same-batch replay is content-stable (stale-manifest repair path)") {
    val root = Files.createTempDirectory("graft-upsertloop-rp").toString
    val (dir, state) = (s"$root/t", s"$root/state")
    val base = orders.where(col("o_orderkey") < 400).localCheckpoint()
    val b0 = mark(base, del = false)
    UpsertLoop.foldBatch(b0, 0L, dir, "o_orderkey", Seq("o_orderkey"), state, Some("__del"))

    val updates = base.where(col("o_orderkey") < 50)
      .withColumn("o_custkey", lit(-1L)).localCheckpoint()
    val b1 = mark(updates, del = false)
      .unionByName(mark(base.where(col("o_orderkey").between(60L, 70L)), del = true))
    UpsertLoop.foldBatch(b1, 1L, dir, "o_orderkey", Seq("o_orderkey"), state, Some("__del"))
    val snap = canon(spark.read.parquet(dir))

    // Replay batch 1: its prior-version manifest now predates the swap
    // (stale by construction) — the fold must repair, re-apply, and land
    // the identical table.
    UpsertLoop.foldBatch(b1, 1L, dir, "o_orderkey", Seq("o_orderkey"), state, Some("__del"))
    assert(canon(spark.read.parquet(dir)) == snap)
    assert(FileStats.isFresh(spark, dir,
      UpsertLoop.latestManifest(spark, state).get))

    // Out-of-band mutation (a writer outside the loop): the next fold's
    // persisted manifest is stale and must repair, not fail.
    val oob = base.where(col("o_orderkey").between(200L, 210L))
      .withColumn("o_totalprice", lit(9.0))
    Maintenance.upsert(spark, dir,
      FileStats.collect(spark, dir, Seq("o_orderkey")), oob, "o_orderkey")
    val b2 = mark(base.where(col("o_orderkey").between(300L, 310L))
      .withColumn("o_totalprice", lit(7.0)), del = false)
    UpsertLoop.foldBatch(b2, 2L, dir, "o_orderkey", Seq("o_orderkey"), state, Some("__del"))
    val tbl = spark.read.parquet(dir)
    val p300 = tbl.where(col("o_orderkey").between(300L, 310L))
      .select("o_totalprice").collect().map(_.getDouble(0))
    assert(p300.nonEmpty && p300.forall(_ == 7.0))
    val p200 = tbl.where(col("o_orderkey").between(200L, 210L))
      .select("o_totalprice").collect().map(_.getDouble(0))
    assert(p200.nonEmpty && p200.forall(_ == 9.0))
    assert(FileStats.isFresh(spark, dir,
      UpsertLoop.latestManifest(spark, state).get))
  }

  test("evolveSchema loop: a restart with a widened source merges into the narrow table") {
    val root = Files.createTempDirectory("graft-upsertloop-ev").toString
    val (dir, state) = (s"$root/t", s"$root/state")
    val base = orders.where(col("o_orderkey") < 400)
      .select("o_orderkey", "o_totalprice").localCheckpoint()
    // Genesis with the narrow schema.
    UpsertLoop.foldBatch(base, 0L, dir, "o_orderkey", Seq("o_orderkey"),
      state, deleteCol = None)
    // Restart: the source gained a column. Without the flag the fold
    // fails loudly before any rewrite (the typed-state default)...
    val widened = base.where(col("o_orderkey").between(100L, 120L))
      .withColumn("o_flag", lit("hot")).localCheckpoint()
    val e = intercept[IllegalArgumentException] {
      UpsertLoop.foldBatch(widened, 1L, dir, "o_orderkey", Seq("o_orderkey"),
        state, deleteCol = None)
    }
    assert(e.getMessage.contains("evolveSchema"))
    // ...with it, touched files rewrite null-padded and the widened
    // column is queryable (mergeSchema read — the documented caveat for
    // raw readers of the mixed layout).
    UpsertLoop.foldBatch(widened, 1L, dir, "o_orderkey", Seq("o_orderkey"),
      state, deleteCol = None, evolveSchema = true)
    val t = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(t.columns.contains("o_flag"))
    assert(t.where(col("o_flag") === "hot").count() == widened.count())
    assert(FileStats.isFresh(spark, dir, UpsertLoop.latestManifest(spark, state).get))
  }

  test("retainHistory loop: every batch version stays time-travelable") {
    val root = Files.createTempDirectory("graft-upsertloop-tt").toString
    val (dir, state) = (s"$root/t", s"$root/state")
    val base = orders.where(col("o_orderkey") < 400).localCheckpoint()
    def fold(b: DataFrame, id: Long): Unit =
      UpsertLoop.foldBatch(b, id, dir, "o_orderkey", Seq("o_orderkey"),
        state, Some("__del"), retainHistory = true)

    fold(mark(base, del = false), 0L)
    val s1 = spark.read.parquet(dir).localCheckpoint()
    fold(mark(base.where(col("o_orderkey") < 50)
      .withColumn("o_totalprice", lit(0.0)), del = false), 1L)
    val s2 = spark.read.parquet(dir).localCheckpoint()
    fold(mark(base.where(col("o_orderkey").between(60L, 70L)), del = true), 2L)
    val s3 = spark.read.parquet(dir).localCheckpoint()

    // No version GC under retainHistory: every batch manifest persists,
    // and each one snapshot-reads its exact post-batch table.
    assert(UpsertLoop.versions(state) == Seq(1L, 2L, 3L))
    assert(canon(UpsertLoop.snapshotAt(spark, dir, state, 1L)) == canon(s1))
    assert(canon(UpsertLoop.snapshotAt(spark, dir, state, 2L)) == canon(s2))
    assert(canon(UpsertLoop.snapshotAt(spark, dir, state, 3L)) == canon(s3))
    // The deleted slice is visible at v2 and gone at v3 — point-in-time
    // semantics, not just content stability.
    assert(UpsertLoop.snapshotAt(spark, dir, state, 2L)
      .where(col("o_orderkey").between(60L, 70L)).count() > 0)
    assert(s3.where(col("o_orderkey").between(60L, 70L)).count() == 0)
  }
}
