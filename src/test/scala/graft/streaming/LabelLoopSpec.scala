package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.GraphOps

/** The streaming label maintainer must produce EXACTLY the batch
  * [[GraphOps.labelPropagation]] labels over the union of all edges
  * seen so far — after every micro-batch, across a mid-stream restart,
  * and under crash replay — while recomputing only the k-hop cone of
  * each append. */
class LabelLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def sym(ps: (String, String)*): Seq[(String, String)] =
    ps.flatMap { case (u, v) => Seq((u, v), (v, u)) }

  private val k = 2

  // Stage 1: a triangle community feeding a chain. Stage 2: a second
  // community bridged onto the chain's END (labels near the bridge move;
  // the triangle sits beyond k hops and must ride its persisted
  // trajectory). Stage 3: a single directed edge to a brand-new node —
  // the minimal cascade.
  private val stage1 = sym("a" -> "b", "a" -> "c", "b" -> "c",
    "c" -> "d", "d" -> "e", "e" -> "f")
  private val stage2 = sym("x" -> "y", "x" -> "z", "y" -> "z", "f" -> "x")
  private val stage3 = Seq("q" -> "e", "e" -> "q")

  private def df(es: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  private def canon(d: DataFrame): Set[(String, String)] =
    d.collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("per-batch fold ≡ batch labelPropagation over the union of all edges") {
    val root = Files.createTempDirectory("graft-labelloop").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    var acc = Seq.empty[(String, String)]
    for ((stage, i) <- Seq(stage1, stage2, stage3).zipWithIndex) {
      acc = acc ++ stage
      LabelLoop.foldBatch(df(stage), i.toLong, "src", "dst", "", k, state, edges, out)
      val want = canon(GraphOps.labelPropagation(df(acc), iterations = k))
      assert(canon(LabelLoop.latestLabels(spark, state, k)) == want,
        s"state labels diverge from the batch sweep after batch $i")
      assert(canon(spark.read.parquet(s"$out/batch=$i")) == want,
        s"emitted labels diverge from the batch sweep after batch $i")
    }
  }

  test("replaying a batch (crash before checkpoint commit) is idempotent") {
    val root = Files.createTempDirectory("graft-labelloop-rp").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    LabelLoop.foldBatch(df(stage1), 0L, "src", "dst", "", k, state, edges, out)
    LabelLoop.foldBatch(df(stage2), 1L, "src", "dst", "", k, state, edges, out)
    val first = canon(LabelLoop.latestLabels(spark, state, k))
    // Crash replay: batch 1 re-runs against the state it already wrote.
    LabelLoop.foldBatch(df(stage2), 1L, "src", "dst", "", k, state, edges, out)
    assert(canon(LabelLoop.latestLabels(spark, state, k)) == first)
    assert(canon(spark.read.parquet(s"$out/batch=1")) ==
      canon(GraphOps.labelPropagation(df(stage1 ++ stage2), iterations = k)))
  }

  test("edge-store compaction: folded labels unchanged, dirs bounded, replay-safe") {
    val root = Files.createTempDirectory("graft-labelloop-cp").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    def dirs(): Set[String] = {
      val (fs, p) = graft.sources.LakeFs.resolve(edges)
      fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSet
    }
    // compactEvery=2: batch 2 triggers the rewrite.
    for ((stage, i) <- Seq(stage1, stage2, stage3).zipWithIndex)
      LabelLoop.foldBatch(df(stage), i.toLong, "src", "dst", "", k, state, edges, out,
        compactEvery = 2)
    assert(dirs() == Set("batch=2_compact"),
      s"store must hold exactly the compacted dir after the cadence hit: ${dirs()}")
    val want = canon(GraphOps.labelPropagation(
      df(stage1 ++ stage2 ++ stage3), iterations = k))
    assert(canon(LabelLoop.latestLabels(spark, state, k)) == want,
      "labels diverged after compaction")
    // The compacted store is globally distinct — re-sent duplicates from
    // separate batches collapsed (stage edges are symmetric, distinct by
    // construction; count must equal the canonical union).
    val stored = spark.read.parquet(s"$edges/batch=2_compact")
    assert(stored.count() == (stage1 ++ stage2 ++ stage3).distinct.size)
    // Crash replay of the compacting batch: target exists (_SUCCESS), so
    // the rewrite is skipped, remaining per-batch dirs fold in, labels
    // stay exact. (Batch 2's delta dir is rewritten by the replay, then
    // folded into the already-complete target via the delete pass.)
    LabelLoop.foldBatch(df(stage3), 2L, "src", "dst", "", k, state, edges, out,
      compactEvery = 2)
    assert(dirs() == Set("batch=2_compact"))
    assert(canon(LabelLoop.latestLabels(spark, state, k)) == want)
  }

  private def edf(es: Seq[(String, String, Boolean)]): DataFrame = {
    import spark.implicits._
    es.toDF("src", "dst", "removed")
  }

  private def nettedTwin(edges: String): Set[(String, String)] =
    canon(GraphOps.labelPropagation(
      LabelLoop.currentEdges(spark, edges), iterations = k))

  test("takedowns: per-batch fold ≡ labelPropagation over the NETTED edge set; isolated nodes drop") {
    val root = Files.createTempDirectory("graft-labelloop-td").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    // b0: the triangle+chain. b1 is MIXED: the chain is cut at d<->e
    // (labels past the cut re-form around e-f), a new community appends,
    // and a never-present edge is removed (no-op — m/n must not appear).
    // b2: e<->f is taken down while d<->e returns — e survives through
    // the re-add, f loses its last live edge and must DROP; one
    // pair is removed AND re-added in the same batch (nets to present).
    val b0 = stage1.map { case (s, t) => (s, t, false) }
    val b1 = Seq(("d", "e", true), ("e", "d", true), ("m", "n", true)) ++
      sym("x" -> "y", "x" -> "z").map { case (s, t) => (s, t, false) }
    val b2 = Seq(("e", "f", true), ("f", "e", true),
      ("d", "e", false), ("e", "d", false),
      ("a", "b", true), ("a", "b", false))
    for ((b, i) <- Seq(b0, b1, b2).zipWithIndex) {
      LabelLoop.foldBatch(edf(b), i.toLong, "src", "dst", "removed", k,
        state, edges, out)
      val want = nettedTwin(edges)
      assert(canon(LabelLoop.latestLabels(spark, state, k)) == want,
        s"state labels diverge from the netted batch sweep after batch $i")
      assert(canon(spark.read.parquet(s"$out/batch=$i")) == want,
        s"emitted labels diverge from the netted batch sweep after batch $i")
    }
    val fin = canon(LabelLoop.latestLabels(spark, state, k)).toMap
    assert(!fin.contains("f"), "a node with no live edge left must drop")
    assert(!fin.contains("m") && !fin.contains("n"),
      "a no-op removal must not introduce nodes")
    assert(fin.contains("e") && fin.contains("a"),
      "re-added endpoints must survive")
  }

  test("takedown crash replay is idempotent; compaction nets the store") {
    val root = Files.createTempDirectory("graft-labelloop-tdrp").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    def dirs(): Set[String] = {
      val (fs, p) = graft.sources.LakeFs.resolve(edges)
      fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSet
    }
    val b0 = stage1.map { case (s, t) => (s, t, false) }
    val b1 = Seq(("d", "e", true), ("e", "d", true), ("q", "e", false),
      ("e", "q", false))
    LabelLoop.foldBatch(edf(b0), 0L, "src", "dst", "removed", k, state, edges, out)
    LabelLoop.foldBatch(edf(b1), 1L, "src", "dst", "removed", k, state, edges, out)
    val first = canon(LabelLoop.latestLabels(spark, state, k))
    LabelLoop.foldBatch(edf(b1), 1L, "src", "dst", "removed", k, state, edges, out)
    assert(canon(LabelLoop.latestLabels(spark, state, k)) == first)
    // Compacting batch (cadence 2): the store nets to one dir holding
    // only PRESENT edges — the taken-down pair is gone from storage.
    LabelLoop.foldBatch(edf(Seq(("f", "x", false), ("x", "f", false))), 2L,
      "src", "dst", "removed", k, state, edges, out, compactEvery = 2)
    assert(dirs() == Set("batch=2_compact"), s"store not compacted: ${dirs()}")
    val stored = spark.read.parquet(s"$edges/batch=2_compact")
    assert(stored.where(col("src") === "d" && col("dst") === "e").count() == 0,
      "a net-removed edge must not survive compaction")
    assert(canon(LabelLoop.latestLabels(spark, state, k)) == nettedTwin(edges))
    // Replay of the compacting batch against the compacted store.
    LabelLoop.foldBatch(edf(Seq(("f", "x", false), ("x", "f", false))), 2L,
      "src", "dst", "removed", k, state, edges, out, compactEvery = 2)
    assert(dirs() == Set("batch=2_compact"))
    assert(canon(LabelLoop.latestLabels(spark, state, k)) == nettedTwin(edges))
  }

  test("streamed run with takedowns and a mid-stream restart ≡ netted labelPropagation") {
    val root = Files.createTempDirectory("graft-labelloop-tdst").toString
    val (src, state, edges, out, ckpt) =
      (s"$root/src", s"$root/state", s"$root/edges", s"$root/out", s"$root/ckpt")
    def runOnce(): Unit = {
      val q = LabelLoop.run(
        spark.readStream.schema(edf(Nil).schema).parquet(src),
        "src", "dst", k, state, edges, out, ckpt,
        trigger = Some(Trigger.AvailableNow()), removedCol = "removed")
      q.awaitTermination(120000)
      q.stop()
    }
    edf(stage1.map { case (s, t) => (s, t, false) }).write.mode("append").parquet(src)
    runOnce() // STOP — mid-stream restart
    edf(Seq(("d", "e", true), ("e", "d", true)) ++
        stage2.map { case (s, t) => (s, t, false) })
      .write.mode("append").parquet(src)
    runOnce()
    val got = canon(LabelLoop.latestLabels(spark, state, k))
    assert(got == nettedTwin(edges) && got.nonEmpty)
  }

  test("streamed run with a mid-stream restart ≡ batch labelPropagation") {
    val root = Files.createTempDirectory("graft-labelloop-st").toString
    val (src, state, edges, out, ckpt) =
      (s"$root/src", s"$root/state", s"$root/edges", s"$root/out", s"$root/ckpt")

    def runOnce(): Unit = {
      val q = LabelLoop.run(
        spark.readStream.schema(df(stage1).schema).parquet(src),
        "src", "dst", k, state, edges, out, ckpt,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination(120000)
      q.stop()
    }

    df(stage1).write.mode("append").parquet(src)
    runOnce() // STOP — mid-stream restart
    df(stage2 ++ stage3).write.mode("append").parquet(src)
    runOnce()

    val want = canon(GraphOps.labelPropagation(
      df(stage1 ++ stage2 ++ stage3), iterations = k))
    assert(canon(LabelLoop.latestLabels(spark, state, k)) == want && want.nonEmpty)
  }
}
