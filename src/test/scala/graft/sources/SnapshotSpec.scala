package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Time travel over retained-history upserts: every persisted manifest
  * version must read back its exact historical table state, raw scans
  * must see only the present, pruning must work from the snapshot's own
  * stats, and vacuum must fail dropped versions LOUDLY rather than let
  * them read partially. */
class SnapshotSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-snapshot-$tag").toString + "/t"

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  test("readAt: each retained manifest version reads its exact historical state") {
    import spark.implicits._
    val d = tmp("tt")
    val (_, m1) = Maintenance.writeOptimized(
      spark, TestSpark.table("orders"), d, Seq("o_orderkey"), 16)
    val v1 = spark.read.parquet(d).localCheckpoint()

    // Merge 1: zero a narrow price slice, delete two keys.
    val ch1 = v1.where(col("o_orderkey").between(100L, 120L))
      .withColumn("o_totalprice", lit(0.0)).localCheckpoint()
    val del1 = Seq(130L, 131L).toDF("k")
    val (_, m2) = Maintenance.upsert(spark, d, m1, ch1, "o_orderkey",
      Some(del1), retainHistory = true)
    val v2 = spark.read.parquet(d).localCheckpoint()

    // Merge 2: brand-new keys past the range.
    val ch2 = v1.where(col("o_orderkey") < 3)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000L).localCheckpoint()
    val (_, m3) = Maintenance.upsert(spark, d, m2, ch2, "o_orderkey",
      retainHistory = true)

    // Every version reads back exactly; the latest equals the live table.
    assert(canon(Maintenance.readAt(spark, d, m1)) == canon(v1))
    assert(canon(Maintenance.readAt(spark, d, m2)) == canon(v2))
    assert(canon(Maintenance.readAt(spark, d, m3)) ==
      canon(spark.read.parquet(d)))
    // The raw scan sees ONLY the present — history is hidden from it.
    assert(canon(spark.read.parquet(d)) != canon(v1))
    // Pruned snapshot read: v1's slice still has its ORIGINAL prices
    // (the later zeroing merge must be invisible), planned from v1's
    // own stats.
    val sliced = Maintenance.readAt(spark, d, m1,
      Seq(ColumnBounds("o_orderkey", Some(100L), Some(120L))))
      .where(col("o_orderkey").between(100L, 120L))
    assert(canon(sliced) ==
      canon(v1.where(col("o_orderkey").between(100L, 120L))))
    assert(sliced.agg(sum(col("o_totalprice"))).head().getDouble(0) > 0.0)
  }

  test("vacuumHistory: retained versions survive, dropped versions fail loudly") {
    import spark.implicits._
    val d = tmp("vac")
    val (_, m1) = Maintenance.writeOptimized(
      spark, TestSpark.table("orders"), d, Seq("o_orderkey"), 16)
    val v1 = spark.read.parquet(d).localCheckpoint()
    val ch1 = v1.where(col("o_orderkey").between(100L, 120L))
      .withColumn("o_totalprice", lit(0.0)).localCheckpoint()
    val (_, m2) = Maintenance.upsert(spark, d, m1, ch1, "o_orderkey",
      retainHistory = true)
    val v2 = spark.read.parquet(d).localCheckpoint()
    val ch2 = v1.where(col("o_orderkey").between(300L, 320L))
      .withColumn("o_totalprice", lit(1.0)).localCheckpoint()
    val (_, m3) = Maintenance.upsert(spark, d, m2, ch2, "o_orderkey",
      retainHistory = true)

    // Drop v1's retention; v2/v3 stay readable, v1 is refused loudly.
    val deleted = Maintenance.vacuumHistory(spark, d, Seq(m2, m3))
    assert(deleted.nonEmpty, "vacuum should have removed v1-only history")
    assert(canon(Maintenance.readAt(spark, d, m2)) == canon(v2))
    assert(canon(Maintenance.readAt(spark, d, m3)) ==
      canon(spark.read.parquet(d)))
    val e = intercept[IllegalArgumentException] {
      Maintenance.readAt(spark, d, m1).count()
    }
    assert(e.getMessage.contains("vacuumed"))
    // Full vacuum: all history gone, the live version still reads.
    Maintenance.vacuumHistory(spark, d, Nil)
    assert(LakeFs.listFiles(s"$d/${Maintenance.HistoryDir}",
      skipHiddenDirs = false).isEmpty)
    assert(canon(Maintenance.readAt(spark, d, m3)) ==
      canon(spark.read.parquet(d)))
    // Vacuum on a table with no history dir is a clean no-op.
    val d2 = tmp("vac-none")
    TestSpark.table("region").write.parquet(d2)
    assert(Maintenance.vacuumHistory(spark, d2, Nil).isEmpty)
  }
}
