package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{DedupOps, GraphOps}

/** Randomized multi-batch property net for the three takedown loops:
  * eight seeded batches of mixed add/remove events over a small node
  * pool — dense enough that pairs get removed, re-added, re-removed
  * across batches, nodes die and revive, and no-op removals land —
  * with per-batch equality against each loop's cold twin over the
  * netted current edge set. The hand-built fixtures in the loop specs
  * pin NAMED scenarios; this sweep pins the interaction space they
  * can't enumerate (deterministic: fixed seed). */
class LoopPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def batches(seed: Long, n: Int, perBatch: Int): Seq[Seq[(String, String, Boolean)]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(perBatch) {
      val a = s"n${rnd.nextInt(14)}"
      val b = s"n${rnd.nextInt(14)}"
      (a, b, rnd.nextInt(3) == 0) // ~1/3 removals
    })
  }

  private def edf(es: Seq[(String, String, Boolean)]): DataFrame = {
    import spark.implicits._
    es.toDF("src", "dst", "removed")
  }

  test("ClusterLoop: 8 random mixed batches, fold ≡ connectedComponents(netted) each batch") {
    val root = Files.createTempDirectory("graft-prop-cl").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    for ((b, i) <- batches(seed = 41, n = 8, perBatch = 10).zipWithIndex) {
      ClusterLoop.foldBatch(
        edf(b).toDF("d1", "d2", "removed"), i.toLong, "d1", "d2", "removed",
        state, edges, out, compactEvery = 3)
      val got = ClusterLoop.latestLabels(spark, state)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val want = DedupOps.connectedComponents(
          ClusterLoop.currentEdges(spark, edges)
            .select(col("lo").as("d1"), col("hi").as("d2")))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == want, s"batch $i diverged:\n got=$got\n want=$want")
    }
  }

  test("LabelLoop: 8 random mixed batches, fold ≡ labelPropagation(netted) each batch") {
    val root = Files.createTempDirectory("graft-prop-ll").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    val k = 2
    for ((b, i) <- batches(seed = 42, n = 8, perBatch = 10).zipWithIndex) {
      LabelLoop.foldBatch(edf(b), i.toLong, "src", "dst", "removed", k,
        state, edges, out, compactEvery = 3)
      val got = LabelLoop.latestLabels(spark, state, k)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val want = GraphOps.labelPropagation(
          LabelLoop.currentEdges(spark, edges), iterations = k)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == want, s"batch $i diverged:\n got=$got\n want=$want")
    }
  }

  test("RankLoop: 8 random mixed batches, fold ≡ pageRankWarm(netted, prior) each batch") {
    val root = Files.createTempDirectory("graft-prop-rl").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    var prior: Option[DataFrame] = None
    for ((b, i) <- batches(seed = 43, n = 8, perBatch = 10).zipWithIndex) {
      RankLoop.foldBatch(edf(b), i.toLong, "src", "dst", "removed", 2,
        state, edges, out, compactEvery = 3, damping = 0.5)
      val net = RankLoop.currentEdges(spark, edges).localCheckpoint()
      val got = RankLoop.latestRanks(spark, state)
        .select("node", "r").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = (prior match {
        case None => GraphOps.pageRank(net, iterations = 2, damping = 0.5)
        case Some(p) => GraphOps.pageRankWarm(net, p, iterations = 2, damping = 0.5)
      }).select("node", "r").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"batch $i diverged:\n got=$got\n want=$want")
      prior = Some(RankLoop.latestRanks(spark, state).localCheckpoint())
    }
  }
}
