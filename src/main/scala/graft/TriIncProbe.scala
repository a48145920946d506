package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagnosis probe (not driver contract): incremental triangle
  * maintenance — after an edge APPEND, does folding per-node deltas into
  * persisted counts ([[graft.ops.GraphOps.triangleCountInc]]) beat the
  * cold O(E^1.5) wedge enumeration over the union graph? Method: count
  * triangles on the base graph (the persisted state), append ~pct new
  * edges (plus a fresh hub), then time cold-union vs fold and verify the
  * two agree count-for-count.
  *
  * Usage: runMain graft.TriIncProbe [nEdges] [appendPct]
  */
object TriIncProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-trincprobe")
    val nEdges = if (args.nonEmpty) args(0).toLong else 1000000L
    val pct = if (args.length > 1) args(1).toDouble else 0.01
    val nNodes = nEdges / 10
    def synth(n: Long, offset: Long): DataFrame =
      spark.range(offset, offset + n).select(
          concat(lit("n"), (col("id") % nNodes).cast("string")).as("src"),
          concat(lit("n"), ((col("id") * col("id") + col("id")) % (nNodes / 10))
            .cast("string")).as("dst"))
    val base = synth(nEdges, 0L).localCheckpoint()
    val extra = synth((nEdges * pct).toLong, nEdges)
      .unionAll(spark.range(50).select(
        concat(lit("m"), col("id").cast("string")).as("src"),
        lit("n0").as("dst"))).localCheckpoint()
    val appended = base.unionAll(extra).localCheckpoint()
    println(s"== base=${base.count()} append=${extra.count()} nodes≈$nNodes")

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val (r, rd, wr) = ShuffleMeter.measure(spark)(f)
      println(f"== $tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f sec  " +
        f"shuffle read=$rd%8.1f MB written=$wr%8.1f MB")
      r
    }
    val prior = t("cold base (state build)") {
      val p = graft.ops.GraphOps.triangleCount(base).localCheckpoint()
      p.count(); p
    }
    val cold = t("cold union recompute") {
      val c = graft.ops.GraphOps.triangleCount(appended).localCheckpoint()
      c.count(); c
    }
    val fold = t("fold (triangleCountInc)") {
      val f = graft.ops.GraphOps.triangleCountInc(prior, base, extra).localCheckpoint()
      f.count(); f
    }
    val diff = fold.select(col("node"), col("triangles").as("tf"))
      .join(cold.select(col("node"), col("triangles").as("tc")), Seq("node"), "full")
      .where(not(col("tf") <=> col("tc"))).count()
    println(s"== fold-vs-cold diverging nodes: $diff (must be 0)")

    // Mixed batch (round 12): the same append PLUS a same-sized random
    // removal — the deletion-aware fold vs the cold recompute of
    // (base ∖ removed) ∪ extra.
    val removed = base.sample(pct, seed = 7).localCheckpoint()
    // Cold reference applies the removal CANONICALLY (every duplicate and
    // reversed copy of a removed undirected edge goes) — the semantics
    // the signed fold implements.
    val remCanon = removed.select(
      least(col("src"), col("dst")).as("lo"),
      greatest(col("src"), col("dst")).as("hi")).distinct()
    val mixedGraph = base.join(remCanon,
        least(base("src"), base("dst")) === col("lo") &&
        greatest(base("src"), base("dst")) === col("hi"), "left_anti")
      .unionAll(extra).localCheckpoint()
    val coldM = t("cold mixed recompute") {
      val c = graft.ops.GraphOps.triangleCount(mixedGraph).localCheckpoint()
      c.count(); c
    }
    val foldM = t("fold (signed, add+rem)") {
      val f = graft.ops.GraphOps.triangleCountInc(prior, base, extra, removed)
        .localCheckpoint()
      f.count(); f
    }
    val diffM = foldM.select(col("node"), col("triangles").as("tf"))
      .join(coldM.select(col("node"), col("triangles").as("tc")), Seq("node"), "full")
      .where(not(col("tf") <=> col("tc"))).count()
    println(s"== signed-fold-vs-cold diverging nodes: $diffM (must be 0)")
    spark.stop()
    if (diff != 0 || diffM != 0) sys.exit(1)
  }
}
