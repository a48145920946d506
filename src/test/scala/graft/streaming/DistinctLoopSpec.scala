package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental exact-distinct fold must EXACTLY equal a one-shot
  * count(distinct) over all history — set union makes batch boundaries
  * and replay invisible — at the stored grouping and at every coarser
  * rollup level. */
class DistinctLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def events = TestSpark.table("events")
    .select("event_id", "user_id", "event_type")

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("two-stage run with restart: folded pair set ≡ one-shot distinct, at every level") {
    val root = Files.createTempDirectory("graft-distinctloop").toString
    val (src, state, ckpt) = (s"$root/src", s"$root/state", s"$root/ckpt")
    val stage1 = events.where(col("event_id") % 3 =!= 0)
    val stage2 = events.where(col("event_id") % 3 === 0)

    def runOnce(): Unit = {
      val q = DistinctLoop.run(
        spark.readStream.schema(events.schema).parquet(src),
        Seq("event_type"), "user_id", state, ckpt,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination(120000)
      q.stop()
    }
    stage1.write.mode("append").parquet(src)
    runOnce() // STOP — mid-stream restart
    stage2.write.mode("append").parquet(src)
    runOnce()

    val folded = DistinctLoop.latestState(spark, state).get
    assert(canon(folded) ==
      canon(DistinctLoop.pairTable(events, Seq("event_type"), "user_id")))
    // Stored grouping report ≡ direct count(distinct).
    val rep = DistinctLoop.report(folded, Seq("event_type"), "user_id")
    val direct = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n_distinct_user_id"))
    assert(canon(rep) == canon(direct) && canon(rep).nonEmpty)
    // Coarser (global) rollup from the SAME state, still exact — the
    // property a per-group counter could never provide.
    val global = DistinctLoop.report(folded, Seq(), "user_id")
    assert(global.head().getLong(0) ==
      events.select(count_distinct(col("user_id"))).head().getLong(0))
  }

  test("seeded history + replay: fold is idempotent by construction") {
    val root = Files.createTempDirectory("graft-distinctloop-rp").toString
    val state = s"$root/state"
    val hist = events.where(col("event_id") % 2 === 0)
    val live = events.where(col("event_id") % 2 === 1)
    DistinctLoop.seedState(
      DistinctLoop.pairTable(hist, Seq("event_type"), "user_id"), state)
    DistinctLoop.foldBatch(live, 0L, Seq("event_type"), "user_id", state)
    val first = canon(DistinctLoop.latestState(spark, state).get)
    DistinctLoop.foldBatch(live, 0L, Seq("event_type"), "user_id", state)
    val second = canon(DistinctLoop.latestState(spark, state).get)
    assert(first == second && first.nonEmpty)
    assert(first == canon(DistinctLoop.pairTable(events, Seq("event_type"), "user_id")))
  }
}
