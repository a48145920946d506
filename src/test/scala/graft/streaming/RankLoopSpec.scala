package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.GraphOps

/** The streaming rank maintainer: each batch's output must equal
  * `pageRankWarm(union of all edges so far, prior state, iterations)`
  * exactly (deterministic fold — crash replay rewrites identical
  * bytes), and a maintained run that has converged must agree with a
  * converged cold `pageRank` over the union to within ONE micro-unit
  * per node (1e-9 of total mass — integer quantization leaves a ±1
  * plateau of stationary points, and warm and cold starts may settle on
  * adjacent ones), including across a mid-stream restart. */
class RankLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def sym(ps: (String, String)*): Seq[(String, String)] =
    ps.flatMap { case (u, v) => Seq((u, v), (v, u)) }

  // Stage 1: a ring with a high-authority hub. Stage 2: a second
  // community bridged in. Stage 3: a dangling sink (exercises the
  // dangling-mass action inside the maintained iteration).
  private val stage1 = sym("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a",
    "a" -> "h", "b" -> "h", "c" -> "h")
  private val stage2 = sym("x" -> "y", "y" -> "z", "z" -> "x", "h" -> "x")
  private val stage3 = Seq("h" -> "sink", "q" -> "sink", "a" -> "q")

  private def df(es: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  private def ranks(d: DataFrame): Map[String, Long] =
    d.select("node", "r").collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Same nodes, every rank within 1 micro-unit (quantization plateau). */
  private def within1(a: Map[String, Long], b: Map[String, Long]): Boolean =
    a.keySet == b.keySet && a.forall { case (k, v) => math.abs(v - b(k)) <= 1L }

  test("per-batch fold ≡ pageRankWarm over the union; fixpoint ≡ converged cold run") {
    val root = Files.createTempDirectory("graft-rankloop").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    // damping 0.5: the integer fixpoint is only reachable within a test
    // budget under fast contraction (0.85^k * 1e9 < 1 needs ~128 rounds;
    // 0.5^40 is sub-integer) — the same discipline as the pageRankWarm spec.
    val d = 0.5
    val iters = 3
    var acc = Seq.empty[(String, String)]
    var priorState: Option[DataFrame] = None
    for ((stage, i) <- Seq(stage1, stage2, stage3).zipWithIndex) {
      acc = acc ++ stage
      RankLoop.foldBatch(df(stage), i.toLong, "src", "dst", "", iters, state, edges, out,
        damping = d)
      val want = ranks(priorState match {
        case None => GraphOps.pageRank(df(acc), iterations = iters, damping = d)
        case Some(p) => GraphOps.pageRankWarm(df(acc), p, iterations = iters, damping = d)
      })
      assert(ranks(RankLoop.latestRanks(spark, state)) == want,
        s"maintained ranks diverge from the warm fold after batch $i")
      assert(ranks(spark.read.parquet(s"$out/batch=$i")) == want)
      priorState = Some(RankLoop.latestRanks(spark, state).localCheckpoint())
    }
    // Drive the maintained state to the integer fixpoint: one more fold
    // of an empty-delta batch with a deep budget, against a deep cold run.
    RankLoop.foldBatch(df(stage3), 3L, "src", "dst", "", 40, state, edges, out,
      damping = d)
    val fix = ranks(GraphOps.pageRank(df(acc), iterations = 60, damping = d))
    val got = ranks(RankLoop.latestRanks(spark, state))
    assert(within1(got, fix),
      s"maintained fixpoint must match the converged cold run within 1 " +
        s"micro-unit:\n got=$got\n fix=$fix")
  }

  test("crash replay of a batch is idempotent") {
    val root = Files.createTempDirectory("graft-rankloop-rp").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    RankLoop.foldBatch(df(stage1), 0L, "src", "dst", "", 2, state, edges, out)
    RankLoop.foldBatch(df(stage2), 1L, "src", "dst", "", 2, state, edges, out)
    val first = ranks(RankLoop.latestRanks(spark, state))
    RankLoop.foldBatch(df(stage2), 1L, "src", "dst", "", 2, state, edges, out)
    assert(ranks(RankLoop.latestRanks(spark, state)) == first)
  }

  private def edf(es: Seq[(String, String, Boolean)]): DataFrame = {
    import spark.implicits._
    es.toDF("src", "dst", "removed")
  }

  test("takedowns: per-batch fold ≡ warm fold over the NETTED edge set; fixpoint ≡ cold run; isolated nodes drop") {
    val root = Files.createTempDirectory("graft-rankloop-td").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    val d = 0.5
    // b0: ring + hub + a q->sink appendix. b1 is REMOVAL-ONLY: the hub
    // loses two in-edges and q loses both incident edges (q must drop
    // from the maintained table — it has no live edge left); also a
    // removal of a never-present edge (pure no-op). b2 is MIXED: one
    // removed hub edge comes back, another ring edge goes, a new node
    // arrives.
    val b0 = (stage1 ++ Seq("q" -> "sink", "a" -> "q"))
      .map { case (s, t) => (s, t, false) }
    val b1 = Seq(("a", "h", true), ("h", "a", true), ("b", "h", true),
      ("h", "b", true), ("a", "q", true), ("q", "sink", true),
      ("nope1", "nope2", true))
    val b2 = Seq(("b", "h", false), ("h", "b", false),
      ("c", "d", true), ("d", "c", true), ("w", "a", false))
    var priorState: Option[DataFrame] = None
    for ((b, i) <- Seq(b0, b1, b2).zipWithIndex) {
      RankLoop.foldBatch(edf(b), i.toLong, "src", "dst", "removed", 3,
        state, edges, out, damping = d)
      val net = RankLoop.currentEdges(spark, edges).localCheckpoint()
      val want = ranks(priorState match {
        case None => GraphOps.pageRank(net, iterations = 3, damping = d)
        case Some(p) => GraphOps.pageRankWarm(net, p, iterations = 3, damping = d)
      })
      assert(ranks(RankLoop.latestRanks(spark, state)) == want,
        s"maintained ranks diverge from the netted warm fold after batch $i")
      priorState = Some(RankLoop.latestRanks(spark, state).localCheckpoint())
    }
    val afterB2 = ranks(RankLoop.latestRanks(spark, state))
    assert(!afterB2.contains("q") && !afterB2.contains("sink"),
      "nodes with no live edge left must drop from the maintained table")
    assert(!afterB2.contains("nope1") && !afterB2.contains("nope2"),
      "a no-op removal must not introduce nodes")
    assert(afterB2.contains("w"), "the mixed batch's new node must appear")
    // Deep budget drives the maintained state to the integer fixpoint of
    // the NETTED set (warm restart on it is sound: the fixpoint is
    // init-independent).
    RankLoop.foldBatch(edf(Seq(("w", "a", false))), 3L, "src", "dst", "removed",
      40, state, edges, out, damping = d)
    val fix = ranks(GraphOps.pageRank(
      RankLoop.currentEdges(spark, edges), iterations = 60, damping = d))
    val got = ranks(RankLoop.latestRanks(spark, state))
    assert(within1(got, fix),
      s"maintained fixpoint after takedowns must match the cold run over " +
        s"the netted set:\n got=$got\n fix=$fix")
  }

  test("takedown crash replay is idempotent") {
    val root = Files.createTempDirectory("graft-rankloop-tdrp").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    val b0 = stage1.map { case (s, t) => (s, t, false) }
    val b1 = Seq(("a", "h", true), ("h", "a", true), ("x", "y", false))
    RankLoop.foldBatch(edf(b0), 0L, "src", "dst", "removed", 2, state, edges, out)
    RankLoop.foldBatch(edf(b1), 1L, "src", "dst", "removed", 2, state, edges, out)
    val first = ranks(RankLoop.latestRanks(spark, state))
    RankLoop.foldBatch(edf(b1), 1L, "src", "dst", "removed", 2, state, edges, out)
    assert(ranks(RankLoop.latestRanks(spark, state)) == first)
  }

  test("streamed run with takedowns and a mid-stream restart reaches the netted cold fixpoint") {
    val root = Files.createTempDirectory("graft-rankloop-tdst").toString
    val (src, state, edges, out, ckpt) =
      (s"$root/src", s"$root/state", s"$root/edges", s"$root/out", s"$root/ckpt")
    def runOnce(): Unit = {
      val q = RankLoop.run(
        spark.readStream.schema(edf(Nil).schema).parquet(src),
        "src", "dst", 40, state, edges, out, ckpt,
        trigger = Some(Trigger.AvailableNow()), compactEvery = 2,
        damping = 0.5, removedCol = "removed")
      q.awaitTermination(120000)
      q.stop()
    }
    edf(stage1.map { case (s, t) => (s, t, false) }).write.mode("append").parquet(src)
    runOnce() // STOP — mid-stream restart
    edf(Seq(("a", "h", true), ("h", "a", true)) ++
        stage2.map { case (s, t) => (s, t, false) })
      .write.mode("append").parquet(src)
    runOnce()
    val fix = ranks(GraphOps.pageRank(
      RankLoop.currentEdges(spark, edges), iterations = 60, damping = 0.5))
    val got = ranks(RankLoop.latestRanks(spark, state))
    assert(within1(got, fix) && fix.nonEmpty,
      s"restarted maintained ranks must reach the netted cold fixpoint:\n" +
        s" got=$got\n fix=$fix")
  }

  test("streamed run with a mid-stream restart reaches the cold fixpoint") {
    val root = Files.createTempDirectory("graft-rankloop-st").toString
    val (src, state, edges, out, ckpt) =
      (s"$root/src", s"$root/state", s"$root/edges", s"$root/out", s"$root/ckpt")
    def runOnce(iters: Int): Unit = {
      val q = RankLoop.run(
        spark.readStream.schema(df(stage1).schema).parquet(src),
        "src", "dst", iters, state, edges, out, ckpt,
        trigger = Some(Trigger.AvailableNow()), compactEvery = 2, damping = 0.5)
      q.awaitTermination(120000)
      q.stop()
    }
    df(stage1).write.mode("append").parquet(src)
    runOnce(40) // STOP — mid-stream restart
    df(stage2 ++ stage3).write.mode("append").parquet(src)
    runOnce(40)
    val fix = ranks(GraphOps.pageRank(
      df(stage1 ++ stage2 ++ stage3), iterations = 60, damping = 0.5))
    val got = ranks(RankLoop.latestRanks(spark, state))
    assert(within1(got, fix) && fix.nonEmpty,
      s"restarted maintained ranks must reach the cold fixpoint within 1 " +
        s"micro-unit:\n got=$got\n fix=$fix")
  }
}
