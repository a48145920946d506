package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental exact-rollup fold must EXACTLY equal the one-shot
  * aggregate over all history — decimal sums make merge order
  * irrelevant — across batch boundaries, a mid-stream restart, and a
  * coarser read-time rollup. */
class AggLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def events = TestSpark.table("events")
    .select("event_id", "user_id", "event_type", "value")

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("two-stage run with restart: folded state ≡ one-shot aggregate, exactly") {
    val root = Files.createTempDirectory("graft-aggloop").toString
    val (src, state, ckpt) = (s"$root/src", s"$root/state", s"$root/ckpt")
    val stage1 = events.where(col("event_id") % 3 =!= 0)
    val stage2 = events.where(col("event_id") % 3 === 0)

    def runOnce(): Unit = {
      val q = AggLoop.run(
        spark.readStream.schema(events.schema).parquet(src),
        Seq("event_type"), Seq("value"), state, ckpt,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination(120000)
      q.stop()
    }

    stage1.write.mode("append").parquet(src)
    runOnce() // STOP — mid-stream restart
    stage2.write.mode("append").parquet(src)
    runOnce()

    val folded = AggLoop.latestState(spark, state).get
    val oneShot = AggLoop.aggTable(events, Seq("event_type"), Seq("value"))
    // EXACT equality of the state tables (decimal sums are associative).
    assert(canon(folded) == canon(oneShot) && canon(folded).nonEmpty)
    // Read-time report agrees with a direct aggregate, including avg.
    val rep = AggLoop.report(folded, Seq("event_type"), Seq("value"))
      .select("event_type", "n", "sum_value", "avg_value")
    val direct = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(28,8)")).cast("double"), 4).as("sum_value"),
        round((sum(col("value").cast("decimal(28,8)")) / count(lit(1))).cast("double"), 4).as("avg_value"))
    assert(canon(rep) == canon(direct))
  }

  test("seeded history + coarser rollup: merge(eras) ≡ one-shot at every level") {
    val root = Files.createTempDirectory("graft-aggloop-seed").toString
    val state = s"$root/state"
    val hist = events.where(col("event_id") % 2 === 0)
    val live = events.where(col("event_id") % 2 === 1)
    AggLoop.seedState(
      AggLoop.aggTable(hist, Seq("event_type", "user_id"), Seq("value")), state)
    AggLoop.foldBatch(live, 0L, Seq("event_type", "user_id"), Seq("value"), state)
    val folded = AggLoop.latestState(spark, state).get
    // Stored grouping.
    assert(canon(folded) ==
      canon(AggLoop.aggTable(events, Seq("event_type", "user_id"), Seq("value"))))
    // Coarser read-time rollup from the SAME state — no raw re-read.
    assert(canon(AggLoop.merge(Seq(folded), Seq("event_type"), Seq("value"))) ==
      canon(AggLoop.aggTable(events, Seq("event_type"), Seq("value"))))
  }

  test("nullable value column: report avg ≡ SQL AVG; all-NULL group is NULL (r5 advice)") {
    val root = Files.createTempDirectory("graft-aggloop-null").toString
    val state = s"$root/state"
    // NULL every third value, and one group that is ALL null — sum skips
    // NULLs, so avg must divide by the non-null count, not n.
    val nulled = events.withColumn("value",
      when(col("event_type") === "click", lit(null).cast("double"))
        .when(col("event_id") % 3 === 0, lit(null).cast("double"))
        .otherwise(col("value")))
    assert(nulled.where(col("event_type") === "click").count() > 0)
    val b0 = nulled.where(col("event_id") % 2 === 0)
    val b1 = nulled.where(col("event_id") % 2 === 1)
    AggLoop.foldBatch(b0, 0L, Seq("event_type"), Seq("value"), state)
    AggLoop.foldBatch(b1, 1L, Seq("event_type"), Seq("value"), state)
    val rep = AggLoop.report(AggLoop.latestState(spark, state).get,
        Seq("event_type"), Seq("value"))
      .select("event_type", "n", "cnt_value", "avg_value")
    val direct = nulled.groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("value")).as("cnt_value"),
        round(avg(col("value").cast("decimal(28,8)")).cast("double"), 4).as("avg_value"))
    assert(canon(rep) == canon(direct))
    // The all-NULL group is present with a NULL average, not dropped or 0.
    assert(rep.where(col("event_type") === "click" && col("avg_value").isNull
      && col("cnt_value") === 0 && col("n") > 0).count() == 1)
  }

  test("pre-cnt state dirs resume after the upgrade (cnt backfilled as n)") {
    // Simulate a state table persisted before cnt_<v> existed.
    val old = AggLoop.aggTable(events, Seq("event_type"), Seq("value")).drop("cnt_value")
    val fresh = AggLoop.aggTable(events, Seq("event_type"), Seq("value"))
    val merged = AggLoop.merge(Seq(old, fresh), Seq("event_type"), Seq("value"))
    assert(merged.columns.contains("cnt_value"))
    // Old rows backfill cnt = n (their avg semantics), so the fold is 2×
    // the single-era aggregate on this all-non-null column.
    val n2 = merged.agg(sum("n"), sum("cnt_value")).head()
    assert(n2.getLong(0) == 2 * events.count() && n2.getLong(1) == n2.getLong(0))
    val rep = AggLoop.report(merged, Seq("event_type"), Seq("value"))
    assert(rep.where(col("avg_value").isNull).count() == 0)
  }

  test("replay overwrites from the same base: state unchanged") {
    val root = Files.createTempDirectory("graft-aggloop-rp").toString
    val state = s"$root/state"
    val batch = events.where(col("event_id") < 700)
    AggLoop.foldBatch(batch, 0L, Seq("event_type"), Seq("value"), state)
    val first = canon(AggLoop.latestState(spark, state).get)
    AggLoop.foldBatch(batch, 0L, Seq("event_type"), Seq("value"), state)
    val second = canon(AggLoop.latestState(spark, state).get)
    assert(first == second && first.nonEmpty)
  }
}
