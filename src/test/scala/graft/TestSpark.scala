package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Graft
import graft.sources.Catalog

/** One shared local session for the whole forked test JVM (never stopped —
  * the JVM exit tears it down). Tests run on sf0.001 for speed. */
object TestSpark {
  val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    // maxFailures = 1 (the local[4] default): a flaky task in any suite
    // FAILS the test instead of being silently retried. The one spec that
    // needs task retry (R9, FaultToleranceSpec) runs in its own forked
    // JVM with its own local[4, 2] session — see Test/testGrouping in
    // build.sbt — so test strictness here is not reduced to serve it.
    val s = Graft.session("graft-test", master = "local[4]")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    Catalog.register(s, sfDir)
    s
  }

  def table(name: String): DataFrame = spark.table(name)

  /** Run a declared corpus query by name on the test scale. */
  def corpus(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)
}
