package graft

import org.apache.spark.sql.functions._

import graft.ops.{Ann, DedupOps}
import graft.sources.Catalog

/** Diagnosis probe (TriIncProbe/CcIncProbe discipline — not driver
  * contract): shuffled-byte asymmetry of the round-13 maintenance folds
  * vs their cold recomputes. Local wall-clock hides shuffle-volume
  * asymmetry (memory-speed exchanges), so the probe reports bytes next
  * to seconds — the quantity that becomes the bottleneck on a
  * network-bound cluster.
  *
  *  - SemDeDup: `Ann.appendSemDedup` of a 1% batch against a persisted
  *    cid-bucketed state (gallery = sf embeddings replicated `reps`×
  *    under distinct ids, frozen auto-k centroids) vs the cold
  *    `semDedupDrops` over the whole corpus.
  *  - Near-dup: `DedupOps.appendNearDup` of a 5% batch against a
  *    persisted banded index (first `docCap` docs — NO replication:
  *    repeating text would explode the pair space quadratically and
  *    measure density, not the fold) vs the cold `minhashLshDocs` over
  *    all `docCap` docs.
  *
  * Usage: runMain graft.FoldAsymProbe [sfDir] [reps] [docCap]
  */
object FoldAsymProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 25
    val docCap = if (args.length > 2) args(2).toLong else 3000L
    val spark = graft.engine.Graft.session("graft-fold-asym-probe")
    Seq("probe_sd_state", "probe_nd").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      spark.sql(s"DROP TABLE IF EXISTS `${t}_bk`")
      spark.sql(s"DROP TABLE IF EXISTS `${t}_tk`")
    }
    Catalog.register(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("graft-fold-asym").toString

    def report(tag: String, wall: Double, rd: Double, wr: Double): Unit =
      println(f"PROBE $tag%-18s wall=$wall%7.2fs shuffleRead=$rd%9.1fMB shuffleWrite=$wr%9.1fMB")

    // ---- SemDeDup fold vs cold ----
    val base = spark.table("embeddings")
    val big = base
      .crossJoin(spark.range(reps.toLong).select(col("id").as("rep")))
      .select((col("vec_id") * lit(reps.toLong) + col("rep")).as("vec_id"),
        col("embedding"))
      .cache()
    val n = big.count()
    val maxId = big.agg(max(col("vec_id"))).head().getLong(0)
    val cut = maxId - n / 100
    val cents = Ann.kmeans(base.where(col("vec_id") < 500),
      Ann.semDedupKFor(n), 3).localCheckpoint()
    println(s"PROBE semdedup corpus=$n batch=${big.where(col("vec_id") > cut).count()} " +
      s"k=${Ann.semDedupKFor(n)}")
    Ann.persistSemDedupState(
      Ann.buildSemDedupState(big.where(col("vec_id") <= cut), cents),
      "probe_sd_state", s"$root/sd", buckets = 32)
    val tau = 0.44
    val t0 = System.nanoTime()
    val (foldDrops, fRd, fWr) = ShuffleMeter.measure(spark) {
      Ann.appendSemDedup(spark, "probe_sd_state", s"$root/sd",
        big.where(col("vec_id") > cut), cents, tau).count()
    }
    report("semdedup_fold", (System.nanoTime() - t0) / 1e9, fRd, fWr)
    val t1 = System.nanoTime()
    val (coldDrops, cRd, cWr) = ShuffleMeter.measure(spark) {
      Ann.semDedupDrops(big, cents, tau).count()
    }
    report("semdedup_cold", (System.nanoTime() - t1) / 1e9, cRd, cWr)
    println(f"PROBE semdedup byteRatio=${(fRd + fWr) / math.max(1e-9, cRd + cWr)}%.3f " +
      s"foldDrops=$foldDrops coldDrops=$coldDrops")

    // ---- Near-dup fold vs cold ----
    val docs = spark.table("documents").where(col("doc_id") < docCap)
      .select("doc_id", "text").cache()
    val nd = docs.count()
    val dCut = docCap - nd / 20
    val (k, bands, thr) = (8, 4, 0.8)
    println(s"PROBE neardup corpus=$nd batch=${docs.where(col("doc_id") >= dCut).count()}")
    DedupOps.persistNearDupIndex(
      DedupOps.buildNearDupIndex(docs.where(col("doc_id") < dCut),
        col("doc_id"), col("text"), k, bands),
      "probe_nd", s"$root/nd", buckets = 32)
    val t2 = System.nanoTime()
    val (foldPairs, nfRd, nfWr) = ShuffleMeter.measure(spark) {
      DedupOps.appendNearDup(spark, "probe_nd", s"$root/nd",
        docs.where(col("doc_id") >= dCut), col("doc_id"), col("text"),
        k, bands, thr).count()
    }
    report("neardup_fold", (System.nanoTime() - t2) / 1e9, nfRd, nfWr)
    val t3 = System.nanoTime()
    val (coldPairs, ncRd, ncWr) = ShuffleMeter.measure(spark) {
      DedupOps.minhashLshDocs(docs, col("doc_id"), col("text"),
        k, bands, thr).count()
    }
    report("neardup_cold", (System.nanoTime() - t3) / 1e9, ncRd, ncWr)
    println(f"PROBE neardup byteRatio=${(nfRd + nfWr) / math.max(1e-9, ncRd + ncWr)}%.3f " +
      s"foldPairs=$foldPairs coldPairs=$coldPairs")

    spark.stop()
  }
}
