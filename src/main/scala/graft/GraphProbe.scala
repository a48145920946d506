package graft

import org.apache.spark.sql.functions._

/** Diagnosis probe (not driver contract): GraphOps.pageRank at scale —
  * per-iteration cost must stay FLAT (the localCheckpoint lineage cut;
  * without it each round's plan contains every previous round) and the
  * quantized mass must stay conserved. Synthetic power-law-ish graph:
  * 1M edges over 100k nodes, dst keyed by a multiplicative hash so
  * in-degree skews. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-graphprobe")
    val nEdges = if (args.nonEmpty) args(0).toLong else 1000000L
    val nNodes = nEdges / 10
    val edges = spark.range(nEdges).select(
        concat(lit("n"), (col("id") % nNodes).cast("string")).as("src"),
        // Quadratic probe into a SMALLER dst range → skewed in-degree.
        concat(lit("n"), ((col("id") * col("id") + col("id")) % (nNodes / 10))
          .cast("string")).as("dst"))
      .localCheckpoint()
    println(s"== edges=${edges.count()} nodes≈$nNodes")
    def timedRank(iters: Int): Double = {
      val ((sec, mass), rd, wr) = ShuffleMeter.measure(spark) {
        val t0 = System.nanoTime()
        val pr = graft.ops.GraphOps.pageRank(edges, iterations = iters)
        val m = pr.agg(sum(col("r"))).head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, m)
      }
      println(f"== iters=$iters%2d  $sec%7.2f sec  mass=$mass  (${sec / iters}%.2f s/iter)  shuffle $rd%.1f MB read / $wr%.1f MB written")
      sec
    }
    val t2 = timedRank(2)
    val t5 = timedRank(5)
    val t10 = timedRank(10)
    println(f"== marginal cost: (5-2)=${(t5 - t2) / 3}%.2f s/iter, (10-5)=${(t10 - t5) / 5}%.2f s/iter — flat = lineage cut works")
    spark.stop()
  }
}
