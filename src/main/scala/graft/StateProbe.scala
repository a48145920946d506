package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{Ann, DedupOps}

/** Diagnosis probe (like AnnProbe/PlanProbe — not driver contract): the
  * steady-state cost of the two persisted-state joins, plain parquet vs
  * bucketed layout, at a given SF dir. Broadcast is disabled so the joins
  * run in the sort-merge regime they occupy at 100 TB (where neither the
  * fingerprint table nor the IVF index fits a broadcast relation). */
object StateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-stateprobe")
    graft.sources.Catalog.register(spark, args(0))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)

    def timed(f: () => org.apache.spark.sql.DataFrame): Double = {
      f().collect(); val t0 = System.nanoTime()
      f().collect(); (System.nanoTime() - t0) / 1e9
    }

    // --- incremental dedup: prior = oldest 90%, batch = newest 10% ---
    val docs = spark.table("documents")
    val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0)
    val cut = maxDoc * 9 / 10
    val prior = DedupOps.fingerprintTable(
      docs.where(col("doc_id") <= cut), col("doc_id"), col("text"))
    val batch = docs.where(col("doc_id") > cut)
    val base = Files.createTempDirectory("graft_stateprobe")
    val plainFp = base.resolve("fp_plain").toString
    val bucketFp = base.resolve("fp_bucket").toString
    prior.write.parquet(plainFp)
    DedupOps.persistFingerprints(prior, "sp_fp", bucketFp, buckets = 32)
    val tFpPlain = timed(() => DedupOps.incrementalDedup(
      batch, col("doc_id"), col("text"), spark.read.parquet(plainFp)).agg(count(lit(1))))
    val tFpBucket = timed(() => DedupOps.incrementalDedup(
      batch, col("doc_id"), col("text"), spark.table("sp_fp")).agg(count(lit(1))))
    if (args.length > 1 && args(1) == "bisect") {
      // Same bucketed files, bucket-blind read: isolates plan shape from
      // file layout.
      spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
      val tBlind = timed(() => DedupOps.incrementalDedup(
        batch, col("doc_id"), col("text"), spark.table("sp_fp")).agg(count(lit(1))))
      spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
      // AQE off: does pinned 32-partition co-partitioning explain the gap?
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val tNoAqePlain = timed(() => DedupOps.incrementalDedup(
        batch, col("doc_id"), col("text"), spark.read.parquet(plainFp)).agg(count(lit(1))))
      val tNoAqeBucket = timed(() => DedupOps.incrementalDedup(
        batch, col("doc_id"), col("text"), spark.table("sp_fp")).agg(count(lit(1))))
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      println(f"BISECT blindBucket=$tBlind%.2f noAqePlain=$tNoAqePlain%.2f noAqeBucket=$tNoAqeBucket%.2f")
    }
    if (args.length > 1 && args(1) == "explain") {
      val fp1 = DedupOps.incrementalDedup(batch, col("doc_id"), col("text"),
        spark.read.parquet(plainFp))
      fp1.collect()
      println("== FP PLAIN ==\n" + fp1.queryExecution.executedPlan.toString.take(5000))
      val fp2 = DedupOps.incrementalDedup(batch, col("doc_id"), col("text"),
        spark.table("sp_fp"))
      fp2.collect()
      println("== FP BUCKET ==\n" + fp2.queryExecution.executedPlan.toString.take(5000))
    }

    // --- IVF probe: index over the gallery, probes = newest 1000 ---
    val emb = spark.table("embeddings")
    val maxVec = emb.agg(max(col("vec_id"))).head().getLong(0)
    val centroids = emb.where(col("vec_id") < 64)
    val gallery = emb.where(col("vec_id") >= 64 && col("vec_id") <= maxVec - 1000)
    val probes = emb.where(col("vec_id") > maxVec - 1000)
    val index = Ann.ivfIndex(gallery, centroids)
    val plainIx = base.resolve("ivf_plain").toString
    val bucketIx = base.resolve("ivf_bucket").toString
    index.write.parquet(plainIx)
    Ann.persistIvfIndex(index, "sp_ivf", bucketIx, buckets = 32)
    val tIvfPlain = timed(() => Ann.topKQuantizedIvfWithIndex(
      probes, spark.read.parquet(plainIx), gallery, centroids, 10).agg(count(lit(1))))
    val tIvfBucket = timed(() => Ann.topKQuantizedIvfWithIndex(
      probes, spark.table("sp_ivf"), gallery, centroids, 10).agg(count(lit(1))))

    // --- q92 span dedup over the whole corpus (the third r4 shuffle shape) ---
    val tSpan = timed(() => DedupOps.spanDedup(docs, col("doc_id"), col("text"))
      .agg(count(lit(1))))

    println(f"STATEPROBE docs=${docs.count()} fpPlain=$tFpPlain%.2f fpBucket=$tFpBucket%.2f " +
      f"ivfPlain=$tIvfPlain%.2f ivfBucket=$tIvfBucket%.2f span=$tSpan%.2f")
    spark.stop()
  }
}
