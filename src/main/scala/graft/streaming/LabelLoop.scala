package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming twin of [[graft.ops.GraphOps.labelPropagation]]: maintain
  * the k-round deterministic LPA labels of a growing edge set without a
  * full-graph re-sweep per batch — the graph-side completion of the
  * O(new-data) loop family ([[DedupLoop]] keep/drop decisions,
  * `pageRankWarm` rank maintenance; this one maintains COMMUNITY
  * labels).
  *
  * Exactness, not approximation: after every batch the emitted labels
  * equal `labelPropagation(union of all edges so far, k)` rank-for-rank
  * (LabelLoopSpec pins it per batch and across a restart). The
  * incremental lever is the k-round DEPENDENCY CONE: a node's round-r
  * label depends only on its ≤r-hop out-neighborhood, so an edge append
  * can only move labels of nodes within k in-hops of the changed
  * sources. Per round the loop recomputes votes ONLY for
  *
  *  - sources of newly-appended edges (their vote set changed),
  *  - new nodes (no prior trajectory), and
  *  - in-neighbors of nodes whose PREVIOUS-round label actually
  *    changed (the cascade frontier — tracked by comparing against the
  *    persisted trajectory, so an append whose labels coincide with
  *    the old ones stops cascading immediately).
  *
  * Everything else reads its persisted round-r label. The carried state
  * is the full TRAJECTORY `(node, l1..lk)` — node-scale × k, the price
  * of restarting the cascade mid-round — plus the accumulated edge set,
  * appended (never rewritten) under `edgesDir/batch=<id>`.
  *
  * Scale shape per batch: k× { one semi join expanding the changed
  * frontier along in-edges, one vote count + WindowGroupLimit top-1
  * restricted to the affected sources }, then one node-scale state
  * rewrite. The full edge set is re-SCANNED each round (columnar,
  * narrow — only src/dst, probed by a broadcast-small frontier, so
  * edge data never enters an exchange) but re-SHUFFLED only on the
  * affected slice; a cold sweep exchanges the full edge set k times
  * per batch. Measured honestly (LabelLoopProbe, SURVEY §6): at
  * local[32] 1M–4M edges the fold and the cold sweep are at PARITY
  * (±20% — local shuffles are memory-speed, and the fold pays ~10
  * job barriers of node-scale state maintenance plus the persisted
  * store read the in-memory sweep skips); the incremental form's win
  * is the shuffled-volume asymmetry (O(affected cone) vs O(E·k)),
  * which pays on network-bound clusters and dense graphs, not on a
  * single box. Same [[VersionedState]] exactly-once posture as the
  * other loops: deterministic Overwrite per batch id for output, edge
  * store, and state; GC below the version read.
  */
object LabelLoop {

  private def stateSchema(iterations: Int) = StructType(
    StructField("node", StringType, nullable = true) +:
      (1 to iterations).map(r => StructField(s"l$r", StringType, nullable = true)))

  private def emptyState(spark: SparkSession, iterations: Int): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], stateSchema(iterations))

  /** Latest per-node labels (the round-k column; empty if never run). */
  def latestLabels(spark: SparkSession, stateDir: String, iterations: Int): DataFrame =
    VersionedState.latest(spark, stateDir, Some(stateSchema(iterations)))
      .getOrElse(emptyState(spark, iterations))
      .select(col("node"), col(s"l$iterations").as("lbl"))

  /** Compact the accumulated edge store into one `batch=<id>_compact`
    * dir (with a global `distinct` — the deliberate, cadence-amortized
    * O(graph) moment; it also collapses cross-batch re-sent edges the
    * per-fold path only dedups on the affected slice), deleting the
    * folded per-batch dirs. Crash-safe under deterministic replay:
    * the target name is batch-unique, a finished target (`_SUCCESS`) is
    * never rewritten — so a crash mid-DELETE cannot lose edges on
    * replay (the already-folded dirs' content lives in the target;
    * re-reading the remaining dirs would drop it, which is why the
    * rewrite is skipped) — and a crash mid-WRITE replays the rewrite
    * from the still-present source dirs. Duplicate edges visible
    * between the write and the deletes are absorbed by the fold's
    * affected-slice dedup. */
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
        .select("src", "dst").distinct()
        .write.mode(SaveMode.Overwrite).parquet(tgt.toString)
    }
    others.foreach(p => fs.delete(p, true))
  }

  /** One micro-batch — exposed for direct replay tests and
    * [[graft.LabelLoopProbe]]; [[run]] wires it into foreachBatch.
    * `compactEvery` > 0 compacts the append-only edge store every that
    * many batches ([[compactEdgeStore]]) — without it a long-running
    * stream accumulates one parquet dir per batch forever and listing/
    * scan cost grows unboundedly. */
  private[graft] def foldBatch(batch: DataFrame, batchId: Long,
                                   src: String, dst: String, iterations: Int,
                                   stateDir: String, edgesDir: String,
                                   outDir: String, compactEvery: Int = 0): Unit = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = batch.sparkSession
    val delta = batch
      .select(col(src).cast("string").as("src"), col(dst).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    delta.write.mode(SaveMode.Overwrite).parquet(s"$edgesDir/batch=$batchId")
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      compactEdgeStore(spark, edgesDir, batchId)
    // Full accumulated edge set, read LAZILY — never materialized or
    // globally deduped per batch (that would be O(graph) work on every
    // fold, swamping a small append's cone; LabelLoopProbe measured the
    // first draft losing to the cold sweep on exactly that). Re-sent
    // edges dedup on the AFFECTED slice below, where the batch operator's
    // `distinct` semantics are actually consumed.
    val store = spark.read.parquet(edgesDir).select(col("src"), col("dst"))

    val priorV = VersionedState.priorVersion(stateDir, batchId)
    val prior = priorV
      .map(v => VersionedState.read(spark, stateDir, v, Some(stateSchema(iterations))))
      .getOrElse(emptyState(spark, iterations))
      .localCheckpoint()

    // The node universe is maintained from STATE + delta (the prior
    // trajectory covers every node the graph had), not re-derived from
    // an edge-store scan.
    // explode, not union: a Union under the anti-join makes Spark's
    // union-constraint rewrite look up attributes that the checkpointed
    // prior no longer exposes (NoSuchElementException at optimization
    // time); toDF re-aliases so prior's own attributes never flow into
    // the later self-joins.
    val deltaNodes = delta
      .select(explode(array(col("src"), col("dst"))).as("node")).distinct()
    val newNodes = deltaNodes.join(prior, Seq("node"), "left_anti")
      .localCheckpoint().toDF("node")
    val nodes = prior.select("node").unionAll(newNodes.select("node"))
      .localCheckpoint().toDF("node")
    val deltaSrcs = delta.select(col("src").as("node")).distinct()
    // Round-0 labels are definitionally the node ids — no state needed.
    var cur = nodes.select(col("node"), col("node").as("lbl"))
    // Nodes whose PREVIOUS-round label differs from the persisted
    // trajectory: at round 0 only new nodes (old l0 never changes).
    var changed = newNodes
    val w = Window.partitionBy("node").orderBy(col("c").desc, col("lbl"))
    var trajCols = Seq.empty[(Int, DataFrame)]
    for (r <- 1 to iterations) {
      // Affected sources this round: changed-label in-neighbors + the
      // always-dirty sets (delta sources re-vote every round; new nodes
      // have no trajectory to fall back on).
      val affected = store
        .join(changed.select(col("node").as("__c")), col("dst") === col("__c"), "left_semi")
        .select(col("src").as("node"))
        .union(deltaSrcs).union(newNodes.select("node"))
        .distinct().localCheckpoint()
      // One-neighbor-one-vote dedup happens HERE, on the affected slice
      // only — cross-batch re-sent edges collapse exactly as the batch
      // operator's global `distinct`, without an O(graph) dedup per fold.
      val votes = store
        .join(affected.select(col("node").as("__a")), col("src") === col("__a"), "left_semi")
        .dropDuplicates("src", "dst")
        .join(cur.select(col("node").as("__n"), col("lbl")), col("__n") === col("dst"))
        .groupBy(col("src").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      val winner = votes.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("node"), col("lbl").as("__wl"))
      // Recomputed labels for the affected set (voteless keep round-r−1).
      val rec = affected
        .join(winner, Seq("node"), "left")
        .join(cur.select(col("node"), col("lbl").as("__prev")), Seq("node"), "left")
        .select(col("node"), coalesce(col("__wl"), col("__prev")).as("__rl"))
        .localCheckpoint()
      val priorR = prior.select(col("node"), col(s"l$r").as("__pl"))
      cur = nodes
        .join(priorR, Seq("node"), "left")
        .join(rec, Seq("node"), "left")
        .select(col("node"), coalesce(col("__rl"), col("__pl")).as("lbl"))
        .localCheckpoint()
      changed = rec.join(priorR, Seq("node"), "left")
        .where(col("__pl").isNull || col("__rl") =!= col("__pl"))
        .select("node")
      trajCols = trajCols :+ (r -> cur)
    }
    cur.write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")
    val traj = trajCols.foldLeft(nodes) { case (acc, (r, lr)) =>
      acc.join(lr.select(col("node"), col("lbl").as(s"l$r")), Seq("node"), "left")
    }
    VersionedState.write(traj, stateDir, batchId + 1)
    priorV.foreach(VersionedState.gcBelow(stateDir, _))
  }

  /** Start the label-maintenance loop over an edge stream carrying
    * `src`/`dst` columns. Round-k labels land under `outDir/batch=<id>/`
    * as the full `(node, lbl)` table; trajectories evolve under
    * `stateDir`; raw edges accumulate under `edgesDir`. */
  def run(stream: DataFrame, src: String, dst: String, iterations: Int,
          stateDir: String, edgesDir: String, outDir: String,
          checkpointDir: String, trigger: Option[Trigger] = None,
          compactEvery: Int = 64): StreamingQuery = {
    val w = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, src, dst, iterations, stateDir, edgesDir,
          outDir, compactEvery)
      }
    trigger.foreach(w.trigger)
    w.start()
  }
}
