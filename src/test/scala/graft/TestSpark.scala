package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Graft
import graft.sources.Catalog

/** One shared local session for the whole forked test JVM (never stopped —
  * the JVM exit tears it down). Tests run on sf0.001 for speed. */
object TestSpark {
  val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    // local[4, 2]: 4 threads, maxFailures = 2 — task RETRY enabled, so
    // the R9 fault-tolerance spec can inject a transient failure and
    // watch the framework recover. Inert for every other suite (retries
    // only engage when a task actually fails).
    val s = Graft.session("graft-test", master = "local[4, 2]")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    Catalog.register(s, sfDir)
    s
  }

  def table(name: String): DataFrame = spark.table(name)

  /** Run a declared corpus query by name on the test scale. */
  def corpus(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)
}
