package graft.sources

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
}
