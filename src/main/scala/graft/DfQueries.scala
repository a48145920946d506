package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DataFrame-API implementations of the contract (filled in per operator
  * family; each must keep the sf0.01 oracle hash green — see LocalVerify). */
object DfQueries {

  def impls: Map[String, (SparkSession, String) => DataFrame] = Map()

  def extra: Map[String, (SparkSession, String) => DataFrame] = Map()

  def extraOracles: Map[String, String] = Map()
}
