package graft

import org.apache.spark.sql.functions._

/** Round-15 probe (diagnosis tooling, not driver contract): time +
  * shuffle-meter the three remaining iterative graph kernels —
  * connectedComponents (pointer jumping), labelPropagation, hitsCounts —
  * on a 1M-edge synthetic graph, before/after the gated node-scale
  * broadcast change. */
object GraphLoopsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-graphloops-probe")
    val nEdges = if (args.nonEmpty) args(0).toLong else 1000000L
    val nNodes = nEdges / 10
    val edges = spark.range(nEdges).select(
        (col("id") % nNodes).as("src"),
        ((col("id") * col("id") + col("id")) % (nNodes / 10)).as("dst"))
      .localCheckpoint()
    edges.count()
    def timed(name: String)(f: => Long): Unit = {
      val ((sec, out), rd, wr) = ShuffleMeter.measure(spark) {
        val t0 = System.nanoTime()
        val o = f
        ((System.nanoTime() - t0) / 1e9, o)
      }
      println(f"== $name%-14s $sec%7.2f s  out=$out  shuffle $rd%.1f MB read / $wr%.1f MB written")
    }
    timed("cc") {
      graft.ops.DedupOps.connectedComponents(
          edges.select(col("src").as("d1"), col("dst").as("d2")), maxIter = 60)
        .agg(count(lit(1))).head().getLong(0)
    }
    timed("lpa-4") {
      graft.ops.GraphOps.labelPropagation(edges, iterations = 4)
        .agg(countDistinct(col("lbl"))).head().getLong(0)
    }
    timed("hitsCounts-3") {
      graft.ops.GraphOps.hitsCounts(edges, iterations = 3)
        .agg(max(col("auth"))).head().getLong(0)
    }
    spark.stop()
  }
}
