package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate/sketch capabilities (SURVEY.md §2.6): results are
  * implementation-defined, so they are asserted within documented error of
  * the exact declared queries rather than hash-declared. */
class ApproxSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("approx_count_distinct (HLL) lands within rsd bounds of exact q05") {
    val exact = TestSpark.corpus("q05_count_distinct").head()
    val approx = TestSpark.table("orders").agg(
      approx_count_distinct(col("o_custkey"), 0.02).as("a"),
      approx_count_distinct(col("o_orderpriority"), 0.02).as("b"),
      approx_count_distinct(col("o_orderstatus"), 0.02).as("c")).head()
    for (i <- 0 to 2) {
      val e = exact.getLong(i).toDouble
      val a = approx.getLong(i).toDouble
      assert(math.abs(a - e) / e <= 0.1, s"col $i: approx $a vs exact $e")
    }
  }

  test("approx_percentile tracks the exact q46 percentiles") {
    val exact = TestSpark.corpus("q46_percentile").head()
    val approx = TestSpark.table("orders").agg(
      approx_percentile(col("o_totalprice"), lit(0.5), lit(10000)).as("p50"),
      approx_percentile(col("o_totalprice"), lit(0.9), lit(10000)).as("p90")).head()
    assert(math.abs(approx.getDouble(0) - exact.getDouble(0)) / exact.getDouble(0) < 0.02)
    assert(math.abs(approx.getDouble(1) - exact.getDouble(1)) / exact.getDouble(1) < 0.02)
  }

  test("df.sample: seeded runs are reproducible and cardinality is in binomial bounds") {
    val orders = TestSpark.table("orders")
    val total = orders.count().toDouble
    val s1 = orders.sample(withReplacement = false, 0.2, seed = 42).count()
    val s2 = orders.sample(withReplacement = false, 0.2, seed = 42).count()
    assert(s1 == s2, "same seed must reproduce the same sample")
    assert(s1 > total * 0.1 && s1 < total * 0.3, s"sample cardinality $s1 of $total out of bounds")
    val s3 = orders.sample(withReplacement = false, 0.2, seed = 7).count()
    assert(s3 > total * 0.1 && s3 < total * 0.3)
  }

  test("TABLESAMPLE SQL surface works with reproducible seed") {
    val a = spark.sql("select count(*) c from orders tablesample (20 percent) repeatable (42)").head().getLong(0)
    val b = spark.sql("select count(*) c from orders tablesample (20 percent) repeatable (42)").head().getLong(0)
    assert(a == b)
  }
}
