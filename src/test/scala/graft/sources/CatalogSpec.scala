package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CatalogSpec extends AnyFunSuite {

  test("describe reports all tables with post-ingest types (events.ts is NTZ)") {
    val report = Catalog.describe(TestSpark.spark, TestSpark.sfDir)
    assert(report.keySet == Catalog.tableNames.toSet)
    val events = report("events").toMap
    assert(events("ts") == "timestamp_ntz", "nanos ingest rewrite must surface NTZ micros")
    assert(report("embeddings").toMap.apply("embedding") == "array<float>")
    assert(report("lineitem").nonEmpty && report("orders").nonEmpty)
  }

  test("register is idempotent per (session, dir)") {
    val s = TestSpark.spark
    Catalog.register(s, TestSpark.sfDir)
    Catalog.register(s, TestSpark.sfDir)
    assert(s.table("orders").count() > 0)
  }

  test("refreshStats tracks an append; stale stats would have under-counted") {
    val s = TestSpark.spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft-refresh").toString + "/t"
    s.table("region").write.parquet(dir)
    val n0 = s.table("region").count()
    // Plan-time rowCount is only surfaced with the cost-based optimizer
    // on (without it the planner uses sizeInBytes alone).
    val cboKeep = s.conf.get("spark.sql.cbo.enabled")
    def rowCount = s.table("an_refresh")
      .queryExecution.optimizedPlan.stats.rowCount.map(_.toLong)
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      Catalog.registerAnalyzed(s, "an_refresh", dir)
      assert(rowCount.contains(n0), s"expected analyzed rowCount $n0, got $rowCount")
      s.table("region").write.mode("append").parquet(dir)
      // The snapshot is now stale — the planner still believes n0. This
      // is the hazard refreshStats exists for: at scale a stale "small"
      // estimate broadcasts a no-longer-small side.
      Catalog.refreshStats(s, "an_refresh", analyzeColumns = Seq("r_regionkey"))
      assert(rowCount.contains(2 * n0),
        s"refreshStats must track the append: expected ${2 * n0}, got $rowCount")
      assert(s.table("an_refresh").count() == 2 * n0)
    } finally {
      s.conf.set("spark.sql.cbo.enabled", cboKeep)
      s.sql("DROP TABLE IF EXISTS `an_refresh`")
    }
  }

  test("refreshStats resolves the H1 __files indirection and refuses unknown names") {
    val s = TestSpark.spark
    // The round-7 fixture ships ts as timestamp[us]; synthesize the
    // nanos-long form the H1 indirection exists for (SourcesSpec does the
    // same — the rewrite is conditional on the OBSERVED type).
    val dir = java.nio.file.Files
      .createTempDirectory("graft-refresh-h1").toString + "/events"
    s.table("events").select(col("event_id"),
        (expr("unix_micros(cast(ts as timestamp_ltz))") * 1000).as("ts"))
      .write.parquet(dir)
    val cboKeep = s.conf.get("spark.sql.cbo.enabled")
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      Catalog.registerAnalyzed(s, "ev_refresh", dir)
      // The stats live on ev_refresh__files; the call takes the logical name.
      Catalog.refreshStats(s, "ev_refresh")
      val stats = s.table("ev_refresh__files")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(stats.exists(_.toLong > 0))
      intercept[IllegalArgumentException] {
        Catalog.refreshStats(s, "no_such_table_anywhere")
      }
    } finally {
      s.conf.set("spark.sql.cbo.enabled", cboKeep)
      s.sql("DROP TABLE IF EXISTS `ev_refresh__files`")
      s.catalog.dropTempView("ev_refresh")
    }
  }
}
