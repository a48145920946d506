package graft

import org.apache.spark.sql.functions._

/** Diagnosis probe (not driver contract): is [[graft.streaming.LabelLoop]]'s
  * k-hop-cone incremental fold actually cheaper than the cold
  * [[graft.ops.GraphOps.labelPropagation]] sweep it equals? Method: fold
  * a 1M-edge base graph as batch 0 (necessarily a full sweep — every
  * node is new), then fold a ~1% append as batch 1 and time it against
  * the cold sweep over the union. Also re-verifies exact equality at
  * this scale (count of label disagreements must be 0).
  *
  * Usage: runMain graft.LabelLoopProbe [nEdges] [appendPct] [iterations]
  */
object LabelLoopProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-labelloopprobe")
    val nEdges = if (args.nonEmpty) args(0).toLong else 1000000L
    val pct = if (args.length > 1) args(1).toDouble else 0.01
    val k = if (args.length > 2) args(2).toInt else 2
    // Edge-to-node ratio: the fold's win regime is DENSE graphs (edge
    // work >> node-scale state maintenance) — measurable via args(3).
    val ratio = if (args.length > 3) args(3).toLong else 10L
    val nNodes = nEdges / ratio
    def synth(n: Long, offset: Long) =
      spark.range(offset, offset + n).select(
          concat(lit("n"), (col("id") % nNodes).cast("string")).as("src"),
          concat(lit("n"), ((col("id") * col("id") + col("id")) % (nNodes / 10))
            .cast("string")).as("dst"))
    val base = synth(nEdges, 0L).localCheckpoint()
    // Two append regimes: LOCAL (a 50-edge chain hanging off one node —
    // the k-hop cone stays tiny) and SPREAD (1% of edge volume over the
    // hub-dense id space — the cone reaches most of the graph, the
    // incremental form's honest worst case).
    val local = spark.range(50).select(
      concat(lit("m"), col("id").cast("string")).as("src"),
      concat(lit("m"), ((col("id") + 1) % 51).cast("string")).as("dst"))
      .localCheckpoint()
    val spread = synth((nEdges * pct).toLong, nEdges).localCheckpoint()
    println(s"== base=${base.count()} nodes≈$nNodes local=${local.count()} spread=${spread.count()} k=$k")

    val root = java.nio.file.Files.createTempDirectory("graft-lblprobe").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val (r, rd, wr) = ShuffleMeter.measure(spark)(f)
      println(f"== $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f sec  " +
        f"shuffle read=$rd%8.1f MB written=$wr%8.1f MB")
      r
    }
    t("fold batch0 (cold, full)") {
      graft.streaming.LabelLoop.foldBatch(base, 0L, "src", "dst", "", k, state, edges, out)
    }
    t("fold batch1 (local 50-edge)") {
      graft.streaming.LabelLoop.foldBatch(local, 1L, "src", "dst", "", k, state, edges, out)
    }
    t("fold batch2 (1% spread)") {
      graft.streaming.LabelLoop.foldBatch(spread, 2L, "src", "dst", "", k, state, edges, out)
    }
    val cold = t("cold sweep over union") {
      val l = graft.ops.GraphOps.labelPropagation(
        base.unionAll(local).unionAll(spread), iterations = k).localCheckpoint()
      l.count(); l
    }
    val diff = graft.streaming.LabelLoop.latestLabels(spark, state, k)
      .join(cold.select(col("node"), col("lbl").as("__c")), Seq("node"), "full")
      .where(!(col("lbl") <=> col("__c"))).count()
    println(s"== label disagreements vs cold sweep: $diff (must be 0)")
    // TAKEDOWN batch: remove the local chain (50 edges) — the cone is
    // the removal sources' k-in-hop neighborhood, so the fold's shuffle
    // should stay batch-scale while the netted cold sweep re-exchanges
    // the full edge set k times.
    val takedown = local.withColumn("removed", lit(true)).localCheckpoint()
    t("fold batch3 (takedown 50-edge)") {
      graft.streaming.LabelLoop.foldBatch(takedown, 3L, "src", "dst", "removed",
        k, state, edges, out)
    }
    val coldNet = t("cold sweep over netted set") {
      val l = graft.ops.GraphOps.labelPropagation(
        graft.streaming.LabelLoop.currentEdges(spark, edges),
        iterations = k).localCheckpoint()
      l.count(); l
    }
    val diff2 = graft.streaming.LabelLoop.latestLabels(spark, state, k)
      .join(coldNet.select(col("node"), col("lbl").as("__c")), Seq("node"), "full")
      .where(!(col("lbl") <=> col("__c"))).count()
    println(s"== label disagreements vs netted cold sweep: $diff2 (must be 0)")
    spark.stop()
  }
}
