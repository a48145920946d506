package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The §2.6 "dialect-only" surfaces with no cross-engine textual form:
  * MapType functions and the DataFrame .pivot() API (whose semantics are
  * hash-declared via the manual-pivot q40). */
class MapAndPivotSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("MapType: build, inspect and index maps from table columns") {
    val m = TestSpark.table("orders")
      .select(map(lit("status"), col("o_orderstatus"),
        lit("priority"), col("o_orderpriority")).as("m"))
    val r = m.select(
      map_keys(col("m")).as("ks"),
      map_values(col("m")).as("vs"),
      element_at(col("m"), "status").as("st")).head()
    assert(r.getSeq[String](0) == Seq("status", "priority"))
    assert(r.getSeq[String](1).length == 2)
    assert(Seq("O", "F", "P").contains(r.getString(2)))
    // map over grouped data: per-status counts as a map column
    val counts = TestSpark.table("orders").groupBy("o_orderstatus").count()
      .agg(map_from_entries(collect_list(struct(col("o_orderstatus"), col("count")))).as("m"))
      .select(explode(col("m"))).collect()
      .map(r2 => r2.getString(0) -> r2.getLong(1)).toMap
    assert(counts.values.sum == TestSpark.table("orders").count())
  }

  test("SQL PIVOT syntax equals the declared manual-pivot q40 counts") {
    val piv = spark.sql(
      """select * from (select user_id, event_type from events)
         pivot (count(*) for event_type in ('click', 'view', 'purchase'))
         order by user_id""")
      .na.fill(0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val manual = TestSpark.corpus("q40_pivot_manual")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(piv == manual)
  }

  test(".pivot() equals the declared manual-pivot q40") {
    val piv = TestSpark.table("events")
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase"))
      .count()
      .na.fill(0L)
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val manual = TestSpark.corpus("q40_pivot_manual")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(piv == manual)
  }
}
