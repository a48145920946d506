package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.SketchOps

/** The streaming census fold must equal the batch sketch table built over
  * the whole history at once — at every rollup level, across a mid-stream
  * restart — and re-folding a batch must change nothing (HLL union is a
  * set operation). */
class SketchLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def events = TestSpark.table("events")
    .select("event_id", "user_id", "event_type")

  private def est(df: DataFrame, keep: String*): Map[Seq[Any], Long] =
    SketchOps.hllRollup(df, keep: _*).collect()
      .map(r => r.toSeq.dropRight(1) -> r.getLong(r.length - 1)).toMap

  test("two-stage run with restart: folded state ≡ one-shot batch sketch table") {
    val root = Files.createTempDirectory("graft-sketchloop").toString
    val (src, state, ckpt) = (s"$root/src", s"$root/state", s"$root/ckpt")
    val stage1 = events.where(col("event_id") % 2 === 0)
    val stage2 = events.where(col("event_id") % 2 === 1)

    def runOnce(): Unit = {
      val q = SketchLoop.run(
        spark.readStream.schema(events.schema).parquet(src),
        "user_id", Seq("event_type"), state, ckpt,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination(120000)
      q.stop()
    }

    stage1.write.mode("append").parquet(src)
    runOnce() // then STOP — the mid-stream restart
    stage2.write.mode("append").parquet(src)
    runOnce()

    val folded = SketchLoop.latestState(spark, state).get
    val oneShot = SketchOps.hllSketchTable(events, "user_id", "event_type")
    // Equal at the stored grouping, at a coarser (global) rollup, and the
    // convenience estimator agrees.
    assert(est(folded, "event_type") == est(oneShot, "event_type"))
    assert(est(folded) == est(oneShot))
    assert(est(folded, "event_type").nonEmpty)
    val viaEstimate = SketchLoop.estimate(spark, state, "event_type").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaEstimate == est(folded, "event_type").map { case (k, v) => k.head.asInstanceOf[String] -> v })
  }

  test("re-folding a replayed batch changes nothing (HLL union is idempotent)") {
    val root = Files.createTempDirectory("graft-sketchloop-rp").toString
    val state = s"$root/state"
    val batch = events.where(col("event_id") < 500)
    SketchLoop.sketchBatch(batch, 0L, "user_id", Seq("event_type"), state)
    val first = est(SketchLoop.latestState(spark, state).get, "event_type")
    SketchLoop.sketchBatch(batch, 0L, "user_id", Seq("event_type"), state)
    val second = est(SketchLoop.latestState(spark, state).get, "event_type")
    assert(first == second && first.nonEmpty)
  }

  test("seeded batch-era state folds under the stream") {
    val root = Files.createTempDirectory("graft-sketchloop-seed").toString
    val state = s"$root/state"
    val historical = events.where(col("event_id") % 2 === 0)
    val live = events.where(col("event_id") % 2 === 1)
    SketchLoop.seedState(
      SketchOps.hllSketchTable(historical, "user_id", "event_type"), state)
    SketchLoop.sketchBatch(live, 0L, "user_id", Seq("event_type"), state)
    val folded = est(SketchLoop.latestState(spark, state).get, "event_type")
    val oneShot = est(SketchOps.hllSketchTable(events, "user_id", "event_type"), "event_type")
    assert(folded == oneShot)
  }
}
