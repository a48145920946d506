package graft

import org.apache.spark.sql.functions._

import graft.ops.Ann
import graft.sources.Catalog

/** Diagnosis probe (like CboProbe/SkewProbe — not driver contract):
  * the regime map of [[Ann.appendIvfIndex]] vs a full index rebuild.
  *
  * Gallery = the SF dir's embeddings replicated `reps`× under distinct
  * ids (default 100× ≈ 200k × 64-dim at sf0.1); batch = the top 1% of
  * ids. Timed: (a) cold full build of the whole gallery, (b) warmed
  * rebuild of the 99% prefix, (c) append of the 1% batch onto (b).
  *
  * MEASURED finding (sf0.1×100, local[32], recorded in SURVEY §6):
  * append 5.4 s vs 11.1 s warmed rebuild — 2×, growing with gallery
  * size (append is O(batch) assignment + two column-pruned metadata
  * passes; rebuild re-assigns every vector). At toy scale (2k vectors)
  * append ≈ rebuild: fixed catalog/job overhead dominates — the
  * feature's regime is the big-gallery steady state.
  *
  * Usage: runMain graft.IvfAppendProbe [sfDir] [reps]
  */
object IvfAppendProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 100
    val spark = graft.engine.Graft.session("graft-ivf-append-probe")
    Seq("probe_ivf_full", "probe_ivf_a").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    Catalog.register(spark, sfDir)

    val base = spark.table("embeddings")
    val big = base
      .crossJoin(spark.range(reps.toLong).select(col("id").as("rep")))
      .select((col("vec_id") * lit(reps.toLong) + col("rep")).as("vec_id"),
        col("embedding"))
      .cache()
    val n = big.count()
    val maxId = big.agg(max(col("vec_id"))).head().getLong(0)
    val cut = maxId - n / 100
    val centroids = Ann.kmeans(base.where(col("vec_id") < 500), 16, 3).cache()
    centroids.count()
    val galA = big.where(col("vec_id") <= cut)
    val galB = big.where(col("vec_id") > cut)
    println(s"PROBE gallery=$n batchRows=${galB.count()}")

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-probe").toString
    timed("build_full_cold")(Ann.persistIvfIndex(
      Ann.ivfIndex(big, centroids), "probe_ivf_full", s"$dir/full", 32))
    timed("build_99pct_warm")(Ann.persistIvfIndex(
      Ann.ivfIndex(galA, centroids), "probe_ivf_a", s"$dir/a", 32))
    val drift = timed("append_1pct")(Ann.appendIvfIndex(
      spark, "probe_ivf_a", s"$dir/a", galB, centroids, 32).collect())
    println(s"PROBE drift clusters=${drift.length} " +
      s"appended=${drift.map(_.getLong(2)).sum}")
    Seq("probe_ivf_full", "probe_ivf_a").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    spark.stop()
  }
}
