package graft

import org.apache.spark.sql.functions._

import graft.ops.SketchOps
import graft.sources.Catalog

/** Diagnosis probe (IvfAppendProbe discipline — not driver contract):
  * the regime map of [[graft.ops.SketchOps.bm25QueryIndexed]] vs the
  * ad-hoc [[graft.api.Pipelines.bm25Rank]]. Corpus = the SF dir's
  * documents replicated `reps`× under distinct ids; the ad-hoc ranker
  * re-tokenizes the whole corpus per query while the indexed form
  * probes only the query terms' postings buckets — the asymmetry that
  * grows with corpus size (and with the query rate: the index build is
  * one-time, amortized over every query).
  *
  * Usage: runMain graft.Bm25Probe [sfDir] [reps] [queries]
  */
object Bm25Probe {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 10
    val nQueries = if (args.length > 2) args(2).toInt else 5
    val spark = graft.engine.Graft.session("graft-bm25-probe")
    Seq("probe_bm25_po", "probe_bm25_dl").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    Catalog.register(spark, sfDir)
    val root = java.nio.file.Files.createTempDirectory("graft-bm25-probe").toString

    val base = spark.table("documents").select("doc_id", "text")
    val big = base
      .crossJoin(spark.range(reps.toLong).select(col("id").as("rep")))
      .select((col("doc_id") * lit(reps.toLong) + col("rep")).as("doc_id"),
        col("text"))
      .cache()
    val n = big.count()
    val terms = Seq(Seq("data", "stream"), Seq("model", "learning"),
      Seq("the", "quality"), Seq("web", "crawl"), Seq("token", "sample"))
    println(s"PROBE corpus=$n reps=$reps queries=$nQueries")

    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"PROBE $tag%-14s wall=${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$rows")
    }

    timed("index_build") {
      SketchOps.persistBm25Index(
        SketchOps.buildBm25Index(big, col("doc_id"), col("text")),
        "probe_bm25", s"$root/idx", buckets = 32)
      0L
    }
    // Warm both paths once (plan/codegen), then time nQueries each.
    graft.api.Pipelines.bm25Rank(big, col("doc_id"), col("text"), terms.head).count()
    SketchOps.bm25QueryIndexed(spark, "probe_bm25", s"$root/idx", terms.head).count()
    timed("adhoc_queries") {
      (0 until nQueries).map(i =>
        graft.api.Pipelines.bm25Rank(big, col("doc_id"), col("text"),
          terms(i % terms.length)).count()).sum
    }
    timed("indexed_queries") {
      (0 until nQueries).map(i =>
        SketchOps.bm25QueryIndexed(spark, "probe_bm25", s"$root/idx",
          terms(i % terms.length)).count()).sum
    }
    spark.stop()
  }
}
