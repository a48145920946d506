package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming twin of [[graft.ops.DedupOps.connectedComponents]] WITH
  * deletions: maintain the dedup cluster map (doc → component label)
  * of an evolving near-dup graph under both edge APPENDS (new
  * duplicates discovered) and edge REMOVALS (takedowns, retractions,
  * license filtering — the events that SPLIT clusters and that the
  * append-only warm start is unsound for). The missing member of the
  * streaming graph family: [[LabelLoop]] maintains community labels,
  * [[RankLoop]] authority, ClusterLoop the component structure itself.
  *
  * Exactness: after every batch the emitted labels equal
  * `connectedComponents(current edge set)` label-for-label
  * (ClusterLoopSpec pins it per batch, across a restart, and under
  * replay). Each batch folds through
  * [[graft.ops.DedupOps.connectedComponentsInc]]'s affected-cone core:
  * labels recompute cold ONLY inside components an added/removed edge
  * touches; every untouched component rides from the persisted state
  * (CcIncProbe: 0.03–0.04× the cold recompute's shuffled bytes).
  *
  * Edge store: SIGNED batch dirs `edgesDir/batch=<id>` carrying
  * `(lo, hi, sign, b)` — one row per canonical pair per batch, sign
  * +1 for upserted edges (within-batch remove+re-add nets to add),
  * −1 for removals, `b` the batch id. The CURRENT edge set is
  * last-action-wins: `sign of max b` per pair — NOT a sum (set
  * semantics: duplicate adds must not need two removals). The fold
  * reads the store through the cone restriction FIRST, so the
  * netting group-by runs on the cone slice, never the store
  * ([[graft.ops.DedupOps]] ccIncCore contract). `compactEvery`
  * batches the store nets globally into one `batch=<id>_compact` dir
  * (the cadence-amortized O(graph) moment, the [[LabelLoop]]
  * discipline).
  *
  * Crash posture: output/state writes are deterministic Overwrite per
  * batch id ([[VersionedState]]); the CC fold itself is IDEMPOTENT
  * under re-applied batches (re-adding a present edge and re-removing
  * an absent one are no-ops), so a replay that finds the store
  * already updated — even already compacted — reaches identical
  * labels. Node ids fold to STRING (the [[LabelLoop]] schema
  * convention); labels are component minima under STRING ordering,
  * matching what `connectedComponents` over string ids returns. */
object ClusterLoop {

  private val stateSchema = StructType(Seq(
    StructField("doc", StringType, nullable = true),
    StructField("label", StringType, nullable = true)))

  private def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], stateSchema)

  /** Latest maintained (doc, label) cluster map (empty if never run). */
  def latestLabels(spark: SparkSession, stateDir: String): DataFrame =
    VersionedState.latest(spark, stateDir, Some(stateSchema))
      .getOrElse(emptyState(spark))

  /** The store's current edge set (lo, hi) under last-action-wins —
    * exposed for spec twins and audits; the per-batch fold never runs
    * this globally. */
  private[graft] def currentEdges(spark: SparkSession, edgesDir: String): DataFrame = {
    val (fs, root) = graft.sources.LakeFs.resolve(edgesDir)
    if (!fs.exists(root)) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("lo", StringType), StructField("hi", StringType))))
    spark.read.parquet(edgesDir)
      .groupBy("lo", "hi").agg(max_by(col("sign"), col("b")).as("__s"))
      .where(col("__s") > 0).select(col("lo"), col("hi"))
  }

  /** Net the signed store into one `batch=<id>_compact` dir (present
    * edges only, sign +1, b = the compaction batch id — every folded
    * action happened at a batch ≤ it), deleting the folded dirs. Same
    * crash-safety shape as [[LabelLoop.compactEdgeStore]]: the target
    * is batch-unique, a finished target is never rewritten, and the
    * fold's idempotence absorbs a replay that sees the compacted
    * store. */
  private[graft] def compactEdgeStore(spark: SparkSession, edgesDir: String,
                                      batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val tgtName = s"batch=${batchId}_compact"
    val (fs, root) = graft.sources.LakeFs.resolve(edgesDir)
    if (!fs.exists(root)) return
    val others = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName != tgtName)
    if (others.isEmpty) return
    val tgt = new Path(root, tgtName)
    if (!fs.exists(new Path(tgt, "_SUCCESS"))) {
      spark.read.parquet(others.map(_.toString).toSeq: _*)
        .groupBy("lo", "hi").agg(max_by(col("sign"), col("b")).as("__s"))
        .where(col("__s") > 0)
        .select(col("lo"), col("hi"), lit(1).as("sign"), lit(batchId).as("b"))
        .write.mode(SaveMode.Overwrite).parquet(tgt.toString)
    }
    // Delete in ASCENDING batch order: for a net-REMOVED pair the +1 dir
    // is always OLDER than the -1 that killed it, so at any crash point
    // the leftover suffix either holds both actions or only the -1 —
    // never a bare +1 that would resurrect the edge when a replayed
    // batch nets the store (compact rows carry the newest b, so they
    // dominate every leftover row for PRESENT edges, but a net-removed
    // edge has NO compact row to dominate with).
    // A foreign dir (a crashed job's leftover) must not kill compaction
    // with a parse error — it sorts first and deletes like any stale dir.
    others.sortBy(p => p.getName.stripPrefix("batch=")
        .stripSuffix("_compact").toLongOption.getOrElse(Long.MinValue))
      .foreach(p => fs.delete(p, true))
  }

  /** One micro-batch — exposed for direct replay tests; [[run]] wires
    * it into foreachBatch. `removedCol` (when non-empty) names a
    * boolean column marking removal events; rows where it is true (and
    * not re-added in the same batch) delete their edge. */
  private[graft] def foldBatch(batch: DataFrame, batchId: Long,
                               d1: String, d2: String, removedCol: String,
                               stateDir: String, edgesDir: String,
                               outDir: String, maxIter: Int = 30,
                               compactEvery: Int = 0): Unit = {
    val spark = batch.sparkSession
    val rm =
      if (removedCol.nonEmpty && batch.columns.contains(removedCol))
        coalesce(col(removedCol).cast("boolean"), lit(false))
      else lit(false)
    val canon = batch
      .select(col(d1).cast("string").as("a"), col(d2).cast("string").as("b"),
        rm.as("__rm"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"), col("__rm"))
      // Within one batch, an upsert beats a removal of the same pair
      // (the Debezium-shaped convention UpsertLoop uses): bool_and —
      // the pair is removed only if EVERY event for it says removed.
      .groupBy("lo", "hi").agg(min(when(col("__rm"), 1).otherwise(0)).as("__allrm"))
      .localCheckpoint()
    val addU = canon.where(col("__allrm") === 0).select(col("lo"), col("hi"))
    val remU = canon.where(col("__allrm") === 1).select(col("lo"), col("hi"))
    // Store row per pair: +1 add-wins, −1 removal (deterministic per
    // batch id — replay rewrites identical bytes).
    canon.select(col("lo"), col("hi"),
        when(col("__allrm") === 1, -1).otherwise(1).as("sign"),
        lit(batchId).as("b"))
      .write.mode(SaveMode.Overwrite).parquet(s"$edgesDir/batch=$batchId")

    val priorV = VersionedState.priorVersion(stateDir, batchId)
    val prior = priorV
      .map(v => VersionedState.read(spark, stateDir, v, Some(stateSchema)))
      .getOrElse(emptyState(spark))
      .localCheckpoint()
    // Old edges reach the fold ONLY through the cone restriction; the
    // last-action-wins netting group-by runs on the cone slice. The
    // store is enumerated WITHOUT this batch's dir — oldEdges is the
    // pre-batch set — but a replay that finds a compacted store
    // (containing this batch) still folds to identical labels: the CC
    // fold is idempotent under re-applied batches.
    val (fs, root) = graft.sources.LakeFs.resolve(edgesDir)
    val priorDirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName != s"batch=$batchId").map(_.toString).toSeq
    val coneExtract = (coneNodes: DataFrame) =>
      if (priorDirs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField("lo", StringType), StructField("hi", StringType))))
      else spark.read.parquet(priorDirs: _*)
        .join(coneNodes.select(col("doc").as("__cn")),
          col("lo") === col("__cn"), "left_semi")
        .groupBy("lo", "hi").agg(max_by(col("sign"), col("b")).as("__s"))
        .where(col("__s") > 0).select(col("lo"), col("hi"))
    val labels = graft.ops.DedupOps.ccIncCore(
        prior, addU, remU, coneExtract, maxIter)
      .localCheckpoint()
    labels.write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")
    VersionedState.write(labels, stateDir, batchId + 1)
    priorV.foreach(VersionedState.gcBelow(stateDir, _))
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      compactEdgeStore(spark, edgesDir, batchId)
  }

  /** Start the cluster-maintenance loop over an edge-event stream
    * carrying `d1`/`d2` columns and (optionally) a boolean `removedCol`
    * marking takedowns. Maintained (doc, label) tables land under
    * `outDir/batch=<id>/`; state evolves under `stateDir`; signed
    * edges accumulate under `edgesDir`. */
  def run(stream: DataFrame, d1: String, d2: String, removedCol: String,
          stateDir: String, edgesDir: String, outDir: String,
          checkpointDir: String, trigger: Option[Trigger] = None,
          maxIter: Int = 30, compactEvery: Int = 64): StreamingQuery = {
    val w = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, d1, d2, removedCol, stateDir, edgesDir,
          outDir, maxIter, compactEvery)
      }
    trigger.foreach(w.trigger)
    w.start()
  }
}
