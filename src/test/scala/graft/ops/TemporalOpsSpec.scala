package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The generic temporal operators must reproduce the declared q15 (as-of)
  * and q14 (time-band) results exactly. */
class TemporalOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("asofJoin reproduces the declared correlated as-of (q15)") {
    val events = TestSpark.table("events")
    val purchases = events.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"))

    val got = TemporalOps.asofJoin(purchases, clicks,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        valueCols = Seq("click_ts"))
      .select("event_id", "click_ts")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap

    val want = TestSpark.corpus("q15_asof_correlated")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap

    assert(got.view.filterKeys(want.contains).toMap == want)
  }

  test("asofJoin plans one shuffle of each side, no nested-loop join") {
    val events = TestSpark.table("events")
    val purchases = events.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"))
    val df = TemporalOps.asofJoin(purchases, clicks, "user_id", "ts", "ts", Seq("click_ts"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"as-of must not nested-loop:\n$plan")
    assert(plan.contains("Window"), "expected window-based fill")
  }

  test("timeBandJoin reproduces the declared range-band join (q14)") {
    val events = TestSpark.table("events")
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("a"), col("user_id"), col("ts").as("ts1"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("b"), col("user_id"), col("ts").as("ts2"))

    val got = TemporalOps.timeBandJoin(clicks, purchases,
        key = "user_id", leftTs = "ts1", rightTs = "ts2", bandSeconds = 300)
      .select("a", "b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val want = TestSpark.corpus("q14_join_range_band")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == want)
  }
}
