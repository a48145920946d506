package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.{ColumnBounds, FileStats}

/** The streamed manifest must equal a fresh batch-era collect over the
  * landed lake at every point — across batch boundaries, a mid-stream
  * restart, and same-batch replay — and pruned reads over the live lake
  * must keep the partition column and match the full scan exactly. */
class ManifestLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def orders = TestSpark.table("orders")
    .select("o_orderkey", "o_custkey", "o_totalprice")

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("two-stage run with restart: streamed manifest ≡ fresh collect; pruned read exact") {
    val root = Files.createTempDirectory("graft-manifestloop").toString
    val (src, out, state, ckpt) = (s"$root/src", s"$root/out", s"$root/state", s"$root/ckpt")
    val stage1 = orders.where(col("o_orderkey") % 2 === 0)
    val stage2 = orders.where(col("o_orderkey") % 2 === 1)

    def runOnce(): Unit = {
      val q = ManifestLoop.run(
        spark.readStream.schema(orders.schema).parquet(src),
        out, Seq("o_orderkey"), state, ckpt,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination(120000)
      q.stop()
    }

    stage1.write.mode("append").parquet(src)
    runOnce() // STOP — mid-stream restart
    stage2.write.mode("append").parquet(src)
    runOnce()

    val manifest = ManifestLoop.latestManifest(spark, state).get
    assert(canon(manifest) == canon(FileStats.collect(spark, out, Seq("o_orderkey"))))

    // Pruned read over the live lake: partition column present, rows exact.
    val bounds = Seq(ColumnBounds("o_orderkey", Some(100L), Some(400L)))
    val got = FileStats.prunedRead(spark, out, manifest, bounds)
    assert(got.columns.contains("batch"), "partition column must survive the pruned read")
    val want = spark.read.parquet(out).where(col("o_orderkey").between(100L, 400L))
    assert(canon(got.drop("batch")) == canon(want.drop("batch")) && got.count() > 0)
    // All landed rows present across the two eras.
    assert(spark.read.parquet(out).count() == orders.count())
  }

  test("same-batch replay: batch dir rewritten, manifest rows replaced not duplicated") {
    val root = Files.createTempDirectory("graft-manifestloop-rp").toString
    val (out, state) = (s"$root/out", s"$root/state")
    val batch = orders.where(col("o_orderkey") < 500)
    ManifestLoop.foldBatch(batch, 0L, out, Seq("o_orderkey"), state)
    ManifestLoop.foldBatch(batch, 0L, out, Seq("o_orderkey"), state)
    val manifest = ManifestLoop.latestManifest(spark, state).get
    // One manifest row per file actually on disk, and stats agree with a
    // fresh collect (file names changed on rewrite — content equality is
    // the invariant).
    assert(canon(manifest) == canon(FileStats.collect(spark, out, Seq("o_orderkey"))))
  }

  test("refreshTable hook: catalog stats track the growing lake at each fold") {
    val root = Files.createTempDirectory("graft-manifestloop-an").toString
    val (out, state) = (s"$root/out", s"$root/state")
    val cboKeep = spark.conf.get("spark.sql.cbo.enabled")
    def rowCount = spark.table("ml_lake")
      .queryExecution.optimizedPlan.stats.rowCount.map(_.toLong)
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val b0 = orders.where(col("o_orderkey") < 500)
      ManifestLoop.foldBatch(b0, 0L, out, Seq("o_orderkey"), state)
      graft.sources.Catalog.registerAnalyzed(spark, "ml_lake", out)
      assert(rowCount.contains(b0.count()))
      // The next fold appends a new batch dir; with the hook wired the
      // planner's row count tracks it without any caller intervention.
      val b1 = orders.where(col("o_orderkey") >= 500 && col("o_orderkey") < 900)
      ManifestLoop.foldBatch(b1, 1L, out, Seq("o_orderkey"), state,
        refreshTable = Some("ml_lake"))
      assert(rowCount.contains(b0.count() + b1.count()),
        s"stats did not track the fold: $rowCount")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cboKeep)
      spark.sql("DROP TABLE IF EXISTS `ml_lake`")
    }
  }
}
