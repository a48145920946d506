package graft

import org.apache.spark.sql.SparkSession

/** Round-16 probe (diagnosis tooling): print the executed join plans of
  * q_join3_topk/q_join5 with table-level stats only vs with join-key
  * column stats — the VERDICT r15 #9 hypothesis check. Measured result:
  * column NDV stats REGRESS both joins at sf0.1; this shows the plan
  * difference behind the numbers.
  *
  * Usage: runMain graft.Cbo16Probe <plain|cols>
  */
object Cbo16Probe {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "plain"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = graft.engine.Graft.session(s"graft-cbo16-$mode")
    val keyCols: Map[String, Seq[String]] = Map(
      "customer" -> Seq("c_custkey", "c_nationkey", "c_mktsegment"),
      "orders"   -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_shipdate"),
      "nation"   -> Seq("n_nationkey", "n_regionkey"),
      "region"   -> Seq("r_regionkey", "r_name"))
    graft.sources.Catalog.tableNames.foreach { n =>
      graft.sources.Catalog.registerAnalyzed(spark, n, s"$sfDir/$n.parquet",
        analyzeColumns = if (mode == "cols") keyCols.getOrElse(n, Nil) else Nil)
    }
    Seq("q_join3_topk", "q_join5").foreach { q =>
      val df = spark.sql(Bench.suite.toMap.apply(q))
      df.collect()
      println(s"==== $q mode=$mode ====")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
