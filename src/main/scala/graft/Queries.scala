package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Catalog

/** Executable side of the contract.
  *
  * Every corpus query runs through [[run]]: DataFrame-API implementations
  * registered in [[impls]] take precedence (they must lower to the same
  * verified semantics — the local hash gate in [[LocalVerify]] enforces it);
  * the rest run the verified Spark-dialect SQL from [[Corpus]].
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
