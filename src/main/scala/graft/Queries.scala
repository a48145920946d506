package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Catalog

/** Executable side of the contract.
  *
  * Every corpus query runs through [[run]]: DataFrame-API implementations
  * registered in [[impls]] take precedence (they must lower to the same
  * verified semantics — the local hash gate in [[LocalVerify]] enforces it);
  * any query without one falls back to the Spark-dialect SQL from [[Corpus]].
  * Every declared query currently has a DF impl, so the SQL surface is
  * verified separately: CorpusSqlSpec executes every sparkSql string and
  * asserts its canonical hash equals the DF impl's (one documented
  * exception: q72's recursive CTE, unsupported by Spark 4.1).
  */
object Queries {

  /** DataFrame-API implementations keyed by corpus query name. */
  def impls: Map[String, (SparkSession, String) => DataFrame] = DfQueries.impls

  def run(spark: SparkSession, dir: String, name: String): DataFrame = {
    Catalog.register(spark, dir)
    impls.get(name) match {
      case Some(f) => f(spark, dir)
      case None    => spark.sql(Corpus.byName(name).sparkSql)
    }
  }

  /** Additional (non-corpus) operators: LLM-pipeline extensions etc. */
  def extra: Map[String, (SparkSession, String) => DataFrame] = DfQueries.extra

  /** DuckDB oracles for the subset of [[extra]] that is SQL-expressible. */
  def extraOracles: Map[String, String] = DfQueries.extraOracles
}
