package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Graft
import graft.sources.Catalog

/** The engine's public entry point: a thin, plan-transparent facade over a
  * configured SparkSession + registered catalog.
  *
  * "Thin" is load-bearing (SURVEY.md §3.2 E2): every method here composes a
  * logical plan and adds zero physical overhead, so the engine's measured
  * cost is exactly the cost of the Catalyst plans it lowers to.
  */
final class GraftSession(val spark: SparkSession, val dataDir: String) {

  Catalog.register(spark, dataDir)

  /** E1 — SQL entry point. */
  def sql(query: String): DataFrame = spark.sql(query)

  /** E2 — DataFrame entry point over a registered table. */
  def table(name: String): DataFrame = spark.table(name)

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  def events: DataFrame     = table("events")
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object GraftSession {
  /** Local session with graft's engine confs (UTC/NTZ/nanos-ingest/AQE). */
  def local(dataDir: String, appName: String = "graft"): GraftSession =
    new GraftSession(Graft.session(appName), dataDir)

  /** Wrap an externally-created session (e.g. a driver harness's). */
  def wrap(spark: SparkSession, dataDir: String): GraftSession =
    new GraftSession(Graft.configure(spark), dataDir)
}
