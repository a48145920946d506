package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Remaining public-surface corners: the driver's flagship entry, join
  * strategy hints, and the user-UDF surface (reference R10 — arbitrary
  * user code; graft prefers native expressions but must support udf()). */
class ApiSurfaceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("SparkEntry.entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("join strategy hints are honored (merge vs shuffle_hash vs broadcast)") {
    val o = TestSpark.table("orders")
    val c = TestSpark.table("customer").select(col("c_custkey").as("o_custkey"))
    def planOf(hint: String): String = {
      val df = o.join(c.hint(hint), "o_custkey")
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(planOf("merge").contains("SortMergeJoin"))
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"))
    assert(planOf("broadcast").contains("BroadcastHashJoin"))
  }

  test("scala udf() registration works in SQL and Column form") {
    val sig = spark.udf.register("tok_sig", (s: String) => s.split(" ").length.toLong)
    val viaSql = spark.sql("select sum(tok_sig(text)) s from documents").head().getLong(0)
    val viaCol = TestSpark.table("documents")
      .agg(sum(sig(col("text")))).head().getLong(0)
    val viaNative = TestSpark.table("documents")
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(viaSql == viaNative && viaCol == viaNative)
  }
}
