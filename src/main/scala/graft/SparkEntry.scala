package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (TPC-H Q1-style decimal-exact aggregation) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_agg_tpch1_decimal")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (plus graft's
    * LLM-pipeline extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Corpus.all.map { c =>
      c.name -> ((s: SparkSession, dir: String) => Queries.run(s, dir, c.name))
    }.toMap ++ Queries.extra

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Corpus.all.map(c => c.name -> c.duckSql).toMap ++ Queries.extraOracles
}
