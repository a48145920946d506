package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing probe: run one bench query against a data dir and
  * print its formatted physical plan (diagnosis tooling, like AnnProbe /
  * SketchProbe — not part of the driver contract). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val spark: SparkSession = graft.engine.Graft.session("graft-planprobe")
    graft.sources.Catalog.register(spark, dir)
    val sql = Bench.suite.toMap.apply(name)
    val df = spark.sql(sql)
    df.collect()
    val t0 = System.nanoTime()
    df.collect()
    println(f"== $name warm: ${(System.nanoTime() - t0) / 1e9}%.3f sec")
    println(df.queryExecution.executedPlan.toString.take(6000))
  }
}
