package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

import graft.engine.Graft

/** Table registration over a test-data directory (one parquet per table).
  *
  * The nanos-timestamp ingest rewrite (SURVEY.md H1) lives here so that no
  * other code path ever sees a raw nanosecond LongType `ts`:
  * `events.ts` TIMESTAMP(NANOS) → read as Long (legacy conf) → integer
  * `div 1000` → `timestamp_micros` → TIMESTAMP_NTZ. Integer division is
  * load-bearing: double division corrupts the microsecond digit above 2^53.
  */
object Catalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from `dir`; `events` gets the H1 rewrite — but only
    * when the file actually carries nanos (surfacing as LongType under the
    * legacy conf). Parquet written with plain micros/millis timestamps
    * (any non-driver source) reads as a timestamp type and passes through. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    Graft.configure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema.find(_.name == "ts").exists(
          _.dataType == org.apache.spark.sql.types.LongType))
      df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    else df
  }

  /** Schema report: table → (column, type) list as the engine exposes it
    * (post-ingest-rewrite — events.ts reports as timestamp_ntz, not the
    * raw parquet nanos long). */
  def describe(spark: SparkSession, dir: String): Map[String, Seq[(String, String)]] =
    tableNames.map { n =>
      n -> load(spark, dir, n).schema.fields.toSeq
        .map(f => (f.name, f.dataType.simpleString))
    }.toMap

  private val registeredKey = "spark.graft.catalog.dir"

  /** Register all tables of `dir` as temp views. Cheap (views are lazy) and
    * idempotent per (session, dir). */
  def register(spark: SparkSession, dir: String): SparkSession = {
    Graft.configure(spark)
    if (!spark.conf.getOption(registeredKey).contains(dir)) {
      tableNames.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      spark.conf.set(registeredKey, dir)
    }
    spark
  }
}
