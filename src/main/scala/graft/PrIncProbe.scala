package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagnosis probe (not driver contract): incremental PageRank
  * maintenance — after an edge APPEND, does warm-starting from the
  * persisted prior ranks ([[graft.ops.GraphOps.pageRankWarm]]) beat a
  * cold rerun? Method: converge on the base graph (the persisted state
  * a maintenance loop would carry), append ~1% new edges (plus new
  * nodes), take a deep cold run on the appended graph as the fixpoint
  * reference, then measure L1 distance to that fixpoint per round for
  * warm vs cold starts — the metric is rounds-to-tolerance, since each
  * round costs the same join+agg either way.
  *
  * Usage: runMain graft.PrIncProbe [nEdges] [appendPct]
  */
object PrIncProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-princprobe")
    val nEdges = if (args.nonEmpty) args(0).toLong else 1000000L
    val pct = if (args.length > 1) args(1).toDouble else 0.01
    val nNodes = nEdges / 10
    def synth(n: Long, offset: Long): DataFrame =
      spark.range(offset, offset + n).select(
          concat(lit("n"), (col("id") % nNodes).cast("string")).as("src"),
          concat(lit("n"), ((col("id") * col("id") + col("id")) % (nNodes / 10))
            .cast("string")).as("dst"))
    val base = synth(nEdges, 0L).localCheckpoint()
    // Appended slice reuses the generator beyond the base range: mostly
    // existing nodes, plus a fresh hub the prior has never seen.
    val extra = synth((nEdges * pct).toLong, nEdges)
      .unionAll(spark.range(50).select(
        concat(lit("m"), col("id").cast("string")).as("src"),
        lit("n0").as("dst")))
    val appended = base.unionAll(extra).localCheckpoint()
    println(s"== base=${base.count()} appended=${appended.count()} nodes≈$nNodes")

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f sec"); r
    }
    val prior = t("converge base (12 iter)") {
      val p = graft.ops.GraphOps.pageRank(base, iterations = 12)
        .select("node", "r").localCheckpoint()
      p.count(); p
    }
    val fix = t("fixpoint ref (25 iter)") {
      val f = graft.ops.GraphOps.pageRankWarm(appended, prior, iterations = 25)
        .select("node", "r").localCheckpoint()
      f.count(); f
    }
    def l1(ranks: DataFrame, ref: DataFrame): Double =
      ranks.select(col("node"), col("r").as("ra"))
        .join(ref.select(col("node"), col("r").as("rb")), Seq("node"), "full")
        .agg(sum(abs(coalesce(col("ra"), lit(0L)) - coalesce(col("rb"), lit(0L)))))
        .head().getLong(0).toDouble / 1e9
    for (k <- Seq(1, 2, 3, 5, 8)) {
      val w = t(s"warm  $k iter") {
        l1(graft.ops.GraphOps.pageRankWarm(appended, prior, iterations = k), fix) }
      val c = t(s"cold  $k iter") {
        l1(graft.ops.GraphOps.pageRank(appended, iterations = k), fix) }
      println(f"== k=$k%2d  L1-to-fixpoint (of total mass 1.0): warm=$w%.6f cold=$c%.6f")
    }

    // TAKEDOWN half (round 14): the same rounds-to-tolerance question
    // after a 1% edge REMOVAL — pageRankWarm on the netted set restarts
    // from ranks converged on the PRE-removal graph (the RankLoop fold).
    // The generator repeats each distinct pair ~10× across the id range
    // (dst is id²+id mod nNodes/10 and src cycles every nNodes), so a
    // pct-of-DISTINCT-edges removal takes pct/10 of the generator range.
    val netted = base
      .join(synth((nEdges * pct / 10).toLong, 0L), Seq("src", "dst"), "left_anti")
      .localCheckpoint()
    println(s"== netted rows=${netted.count()} (removed ~$pct of distinct edges)")
    val priorApp = t("converge appended (12 iter)") {
      val p = graft.ops.GraphOps.pageRank(appended, iterations = 12)
        .select("node", "r").localCheckpoint()
      p.count(); p
    }
    val fixNet = t("netted fixpoint ref (25 iter)") {
      val f = graft.ops.GraphOps.pageRankWarm(netted, priorApp, iterations = 25)
        .select("node", "r").localCheckpoint()
      f.count(); f
    }
    for (k <- Seq(1, 2, 3)) {
      val w = t(s"warm-after-removal $k iter") {
        l1(graft.ops.GraphOps.pageRankWarm(netted, priorApp, iterations = k), fixNet) }
      val c = t(s"cold-after-removal $k iter") {
        l1(graft.ops.GraphOps.pageRank(netted, iterations = k), fixNet) }
      println(f"== rm k=$k%2d  L1-to-fixpoint: warm=$w%.6f cold=$c%.6f")
    }

    // NETTING-COST half (round 14): RankLoop nets the signed store
    // globally every batch — deliberate, because the matvec consumes the
    // full edge set per iteration anyway. Put a number on that claim:
    // one last-action netting group-by over a signed store vs ONE
    // pageRank iteration over the same edges.
    val signed = base.select(col("src"), col("dst"), lit(1).as("sign"),
        (abs(xxhash64(col("src"), col("dst"))) % 64).as("b"))
      .localCheckpoint()
    t("netting group-by (full store)") {
      graft.streaming.SignedEdgeStore.net(signed, "src", "dst")
        .agg(count(lit(1))).head()
    }
    t("one pageRank iteration") {
      graft.ops.GraphOps.pageRank(base, iterations = 1)
        .agg(count(lit(1))).head()
    }
    spark.stop()
  }
}
