package graft

import org.apache.spark.sql.SparkSession

/** Round-16 probe (diagnosis tooling, not driver contract): split
  * q_window_run's per-run cost into analysis/optimization/physical-plan
  * time vs execution time, under the temp-view vs stats-catalog
  * registration paths — the r15 bench showed a ~0.06 s regression with a
  * byte-identical executed plan, so the suspect is plan-time work
  * (catalog lookups, CBO costing), not the plan.
  *
  * Usage: runMain graft.WinProbe <view|stats> [queryName] [samples]
  */
object WinProbe {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "stats"
    val qname = if (args.length > 1) args(1) else "q_window_run"
    val samples = if (args.length > 2) args(2).toInt else 7
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = graft.engine.Graft.session(s"graft-winprobe-$mode")
    if (mode == "stats") graft.sources.Catalog.register(spark, sfDir)
    else graft.sources.Catalog.tableNames.foreach { n =>
      graft.sources.Catalog.load(spark, sfDir, n).createOrReplaceTempView(n)
    }
    val sql = Bench.suite.toMap.apply(qname)
    spark.sql(sql).collect() // warm
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val timed = Seq.fill(samples) {
      val t0 = System.nanoTime()
      val df = spark.sql(sql)
      df.queryExecution.assertAnalyzed()
      val t1 = System.nanoTime()
      df.queryExecution.optimizedPlan // optimizer incl. CBO costing prep
      val t2 = System.nanoTime()
      df.queryExecution.executedPlan // physical planning (AQE wrapper)
      val t3 = System.nanoTime()
      df.collect()
      val t4 = System.nanoTime()
      (t1 - t0, t2 - t1, t3 - t2, t4 - t3)
    }
    def col(f: ((Long, Long, Long, Long)) => Long): Double =
      median(timed.map(t => f(t) / 1e6))
    println(f"WINPROBE mode=$mode q=$qname analyze=${col(_._1)}%.1f ms " +
      f"optimize=${col(_._2)}%.1f ms plan=${col(_._3)}%.1f ms exec=${col(_._4)}%.1f ms")
    spark.stop()
  }
}
