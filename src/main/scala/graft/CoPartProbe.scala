package graft

import org.apache.spark.sql.functions._

/** Round-15 diagnosis: does Dataset.localCheckpoint preserve physical
  * hash-partitioning so EnsureRequirements can elide the Exchange on a
  * subsequent same-key join? */
object CoPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-copart-probe")
    import spark.implicits._
    val e = (1 to 100000).map(i => (i % 1000L, i % 77L)).toDF("src", "dst")
      .repartition(32, col("src")).localCheckpoint()
    println("e partitioning preserved? plan of e:")
    println(e.queryExecution.optimizedPlan.toString.take(500))
    val hub = (1 to 1000).map(i => (i.toLong, 1.0)).toDF("node", "hub")
    val j = e.join(hub.hint("shuffle_hash"), hub("node") === e("src"))
      .groupBy(e("dst")).agg(sum("hub"))
    j.collect()
    println(j.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
