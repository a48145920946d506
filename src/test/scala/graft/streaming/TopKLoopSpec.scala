package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental top-k fold must EXACTLY equal the one-shot top-k over
  * all history — the containment argument makes truncated state lossless —
  * across batch boundaries, a mid-stream restart, cross-batch
  * displacement, ties, and replay. */
class TopKLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def events = TestSpark.table("events")
    .select("event_id", "user_id", "event_type", "value")

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("two-stage run with restart: folded leaderboard ≡ one-shot top-k, exactly") {
    val root = Files.createTempDirectory("graft-topkloop").toString
    val (src, state, ckpt) = (s"$root/src", s"$root/state", s"$root/ckpt")
    val stage1 = events.where(col("event_id") % 3 =!= 0)
    val stage2 = events.where(col("event_id") % 3 === 0)

    def runOnce(): Unit = {
      val q = TopKLoop.run(
        spark.readStream.schema(events.schema).parquet(src),
        Seq("event_type"), "value", "event_id", 5, state, ckpt,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination(120000)
      q.stop()
    }

    stage1.write.mode("append").parquet(src)
    runOnce() // STOP — mid-stream restart
    stage2.write.mode("append").parquet(src)
    runOnce()

    val folded = TopKLoop.latestState(spark, state).get
    val oneShot = TopKLoop.topK(events, Seq("event_type"), "value", "event_id", 5)
    assert(canon(folded) == canon(oneShot) && canon(folded).nonEmpty)

    // Non-vacuous: stage 2 must have displaced at least one stage-1 keeper,
    // or this test never exercised the cross-batch merge path.
    assert(folded.where(col("event_id") % 3 === 0).count() > 0,
      "no stage-2 row made the final leaderboard — displacement untested")
  }

  test("seeded history + ascending order: fold ≡ one-shot bottom-k") {
    val root = Files.createTempDirectory("graft-topkloop-seed").toString
    val state = s"$root/state"
    val hist = events.where(col("event_id") % 2 === 0)
    val live = events.where(col("event_id") % 2 === 1)
    TopKLoop.seedState(
      TopKLoop.topK(hist, Seq("user_id"), "value", "event_id", 3, descending = false), state)
    TopKLoop.foldBatch(live, 0L, Seq("user_id"), "value", "event_id", 3,
      descending = false, state)
    val folded = TopKLoop.latestState(spark, state).get
    assert(canon(folded) ==
      canon(TopKLoop.topK(events, Seq("user_id"), "value", "event_id", 3, descending = false)))
  }

  test("ties resolve to the lowest tiebreak id, deterministically") {
    import spark.implicits._
    val tied = Seq(
      ("g", 10.0, 4L), ("g", 10.0, 2L), ("g", 10.0, 7L), ("g", 10.0, 1L),
      ("g", 99.0, 9L)).toDF("grp", "score", "id")
    val top = TopKLoop.topK(tied, Seq("grp"), "score", "id", 3)
      .select("id").as[Long].collect().toSet
    // 99.0 wins outright; the two remaining slots go to the LOWEST ids
    // among the 10.0 ties.
    assert(top == Set(9L, 1L, 2L))
  }

  test("replay overwrites from the same base: state unchanged, no slot double-fill") {
    val root = Files.createTempDirectory("graft-topkloop-rp").toString
    val state = s"$root/state"
    val batch = events.where(col("event_id") < 700)
    TopKLoop.foldBatch(batch, 0L, Seq("event_type"), "value", "event_id", 5,
      descending = true, state)
    val first = canon(TopKLoop.latestState(spark, state).get)
    TopKLoop.foldBatch(batch, 0L, Seq("event_type"), "value", "event_id", 5,
      descending = true, state)
    val second = canon(TopKLoop.latestState(spark, state).get)
    assert(first == second && first.nonEmpty)
    // Every row distinct: a double-fold bug would let one row hold two slots.
    assert(first.distinct.size == first.size)
  }

  test("fold's rank bound lowers to WindowGroupLimit (pre-exchange truncation)") {
    val plan = TopKLoop.topK(events, Seq("event_type"), "value", "event_id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }
}
