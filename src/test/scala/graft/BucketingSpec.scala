package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing — the co-located-join posture for repeated large joins: both
  * sides pre-hashed into the same bucket layout on the join key means the
  * sort-merge join reads buckets pairwise with NO shuffle exchange at query
  * time. At 100 TB this converts every recurring fact⋈fact join from a
  * full-network shuffle into a local merge. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    TestSpark.table("orders")
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    TestSpark.table("customer")
      .select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_acctbal"))
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("customer_bucketed")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"), "o_custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // Same results as the unbucketed join.
      val n = joined.count()
      val plainN = TestSpark.table("orders").join(
        TestSpark.table("customer").select(col("c_custkey").as("o_custkey")),
        "o_custkey").count()
      assert(n == plainN)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("drop table if exists orders_bucketed")
      spark.sql("drop table if exists customer_bucketed")
    }
  }
}
