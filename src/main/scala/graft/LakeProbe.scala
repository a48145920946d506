package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{ColumnBounds, FileStats}
import graft.streaming.{DistinctLoop, TopKLoop}

/** Diagnosis probe (like StateProbe — not driver contract): scale
  * behavior of the round-5 lake/stream additions at a given SF dir.
  *
  *  - FileStats: manifest collection cost (one distributed pass), pruned
  *    vs full range probe on a sorted layout, incremental update cost on
  *    a 10% append (must be ~10% of a fresh collect's data cost).
  *  - TopKLoop: one fold of a 10% batch onto seeded state (must be batch-
  *    sized, not history-sized — the state side is groups·k rows).
  */
object LakeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-lakeprobe")
    graft.sources.Catalog.register(spark, args(0))

    def timed[A](f: () => A): (Double, A) = {
      f(); val t0 = System.nanoTime()
      val a = f(); ((System.nanoTime() - t0) / 1e9, a)
    }
    def p(name: String, sec: Double, note: String = ""): Unit =
      println(f"== $name%-28s $sec%8.3f sec  $note")

    val base = Files.createTempDirectory("graft_lakeprobe")

    // --- FileStats over a sorted orders layout ---
    val nFiles = if (args.length > 1) args(1).toInt else 64
    val orders = spark.table("orders")
    val mx = orders.agg(max(col("o_orderkey"))).head().getLong(0)
    val dir = base.resolve("orders_sorted").toString
    orders.repartitionByRange(nFiles, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey").write.parquet(dir)

    // Time the MATERIALIZED stats pass (collect() runs the job; a bare
    // .persist() is lazy and would time only plan construction).
    val (tCollect, _) =
      timed(() => FileStats.collect(spark, dir, Seq("o_orderkey")).collect())
    val manifest0 = FileStats.collect(spark, dir, Seq("o_orderkey")).persist()
    manifest0.count()
    p("manifest_collect", tCollect, s"rows=${orders.count()}")

    val bounds = Seq(ColumnBounds("o_orderkey", Some(mx / 4), Some(mx / 4 + mx / 64)))
    val (tPruned, _) = timed(() =>
      FileStats.prunedRead(spark, dir, manifest0, bounds)
        .agg(count(lit(1)), sum(col("o_totalprice"))).collect())
    val (tFull, _) = timed(() =>
      spark.read.parquet(dir).where(FileStats.residual(bounds))
        .agg(count(lit(1)), sum(col("o_totalprice"))).collect())
    p("range_probe_pruned", tPruned,
      s"files=${FileStats.prunedFiles(manifest0, bounds).size}/$nFiles")
    p("range_probe_full", tFull)

    // Append 10% more rows; update must touch only the new files.
    orders.where(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + mx + 1)
      .repartition(6).write.mode("append").parquet(dir)
    val (tUpdate, _) = timed(() =>
      FileStats.update(spark, dir, manifest0, Seq("o_orderkey")).collect())
    p("manifest_update_10pct", tUpdate)

    // --- TopKLoop fold: seeded 90% history, fold the newest 10% ---
    val events = spark.table("events")
      .select("event_id", "user_id", "event_type", "value")
    val maxEv = events.agg(max(col("event_id"))).head().getLong(0)
    val cut = maxEv * 9 / 10
    val stateDir = base.resolve("topk_state").toString
    TopKLoop.seedState(
      TopKLoop.topK(events.where(col("event_id") <= cut),
        Seq("event_type"), "value", "event_id", 10), stateDir)
    val batch = events.where(col("event_id") > cut)
    val state = TopKLoop.latestState(spark, stateDir).get
    // The fold's compute = merge(state, topK(batch)); the loop adds only
    // the (tiny) versioned-state parquet write on top.
    val (tFold, folded) = timed(() =>
      TopKLoop.merge(Seq(state, TopKLoop.topK(batch, Seq("event_type"), "value", "event_id", 10)),
        Seq("event_type"), "value", "event_id", 10).collect())
    p("topk_fold_10pct", tFold, s"state_rows=${folded.length}")

    // --- DistinctLoop fold: same 90/10 split; the fold must cost one
    // shuffle of the BATCH's distinct pairs plus a union-distinct over
    // state (state-sized reads, not history re-reads) ---
    val dlState = base.resolve("distinct_state").toString
    DistinctLoop.seedState(
      DistinctLoop.pairTable(events.where(col("event_id") <= cut),
        Seq("event_type"), "user_id"), dlState)
    val dlPrior = DistinctLoop.latestState(spark, dlState).get
    val (tDlFold, dlRows) = timed(() =>
      DistinctLoop.merge(Seq(dlPrior,
        DistinctLoop.pairTable(batch, Seq("event_type"), "user_id"))).count())
    p("distinct_fold_10pct", tDlFold, s"pair_rows=$dlRows")

    spark.stop()
  }
}
