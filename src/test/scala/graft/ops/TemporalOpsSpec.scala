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

  test("asofJoin attaches the latest right row ATOMICALLY and ignores null-ts/null-key right rows") {
    import spark.implicits._
    val left = Seq((1L, Option(10L), 100L), (2L, Option.empty[Long], 100L))
      .toDF("id", "k", "lts")
    val right = Seq(
      (Option(10L), Option(1L), Option(5L), Option.empty[Long]), // (price=5, qty=null)
      (Option(10L), Option(2L), Option.empty[Long], Option(7L)), // latest: (null, 7)
      (Option(10L), Option.empty[Long], Option(99L), Option(99L)), // null ts: never matches
      (Option.empty[Long], Option(1L), Option(88L), Option(88L))   // null key: never matches
    ).toDF("k", "rts", "price", "qty")
    val got = TemporalOps.asofJoin(left, right, "k", "lts", "rts", Seq("price", "qty"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4))))
    // Row 1 gets the LATEST right row's values as-is — not a column-wise
    // stitch (price=5 from an older row) and not the null-ts row's 99s.
    assert(got(0) == (1L, None, Some(7L)), s"got ${got(0)}")
    // Null-key left rows match nothing (equi semantics), not the null-key
    // right row.
    assert(got(1) == (2L, None, None), s"got ${got(1)}")
  }

  test("asofJoin directions: forward finds the next row, nearest ties go backward") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L), (2L, 1L, 300L), (3L, 2L, 100L))
      .toDF("id", "k", "lts")
    val right = Seq(
      (1L, 90L, "a"), (1L, 105L, "b"), (1L, 200L, "c"),
      (2L, 95L, "x"), (2L, 105L, "y")) // equidistant from 100
      .toDF("k", "rts", "v")
    def run(dir: String) = TemporalOps
      .asofJoin(left, right, "k", "lts", "rts", Seq("v"), direction = dir)
      .orderBy("id").collect().map(r => Option(r.getString(3))).toSeq
    // id=1 (ts 100): backward a (90), forward b (105), nearest b (5 < 10).
    // id=2 (ts 300): backward c, forward NONE, nearest falls back to c.
    // id=3 (ts 100): x and y both 5 away — the tie goes BACKWARD (x).
    assert(run("backward") == Seq(Some("a"), Some("c"), Some("x")))
    assert(run("forward") == Seq(Some("b"), None, Some("y")))
    assert(run("nearest") == Seq(Some("b"), Some("c"), Some("x")))
    intercept[IllegalArgumentException] {
      TemporalOps.asofJoin(left, right, "k", "lts", "rts", Seq("v"), "sideways")
    }
  }

  test("timeBandJoin accepts identical column names on both sides") {
    val events = TestSpark.table("events")
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("a"), col("user_id"), col("ts"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("b"), col("user_id"), col("ts"))
    // Same "ts" name on both sides used to fail analysis with
    // AMBIGUOUS_REFERENCE; the right's collided columns come out __r_-prefixed.
    val got = TemporalOps.timeBandJoin(clicks, purchases, "user_id", "ts", "ts", 300L)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = TestSpark.corpus("q14_join_range_band")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.subsetOf(got) && got.nonEmpty)
  }

  test("timeBandJoin rejects a non-positive band at call time") {
    val e = TestSpark.table("events").select(col("event_id").as("a"), col("user_id"), col("ts"))
    intercept[IllegalArgumentException] {
      TemporalOps.timeBandJoin(e, e, "user_id", "ts", "ts", 0L)
    }
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
