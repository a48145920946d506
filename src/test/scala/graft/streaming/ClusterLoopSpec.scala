package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.DedupOps

/** The streaming cluster maintainer must produce EXACTLY the batch
  * `connectedComponents(current edge set)` labels — after every
  * micro-batch (including ones whose takedowns SPLIT clusters), across
  * a mid-stream restart, under crash replay (including a replay that
  * finds the store already compacted), while recomputing only the
  * affected components' cone. */
class ClusterLoopSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // b0: a 5-chain (one cluster), two pairs. b1: a takedown SPLITS the
  // chain, an append MERGES the pairs, plus a removal of an edge that
  // never existed (pure no-op — its endpoints must not appear).
  // b2: a takedown isolates p (drops from the map), c-d is re-added,
  // and a-b is removed AND re-added in one batch (nets to present).
  private val b0 = Seq(("a", "b", false), ("b", "c", false), ("c", "d", false),
    ("d", "e", false), ("p", "q", false), ("r", "s", false))
  private val b1 = Seq(("c", "d", true), ("q", "r", false), ("x", "y", true))
  private val b2 = Seq(("p", "q", true), ("c", "d", false),
    ("a", "b", true), ("a", "b", false))

  private def df(es: Seq[(String, String, Boolean)]): DataFrame = {
    import spark.implicits._
    es.toDF("d1", "d2", "removed")
  }

  private def labels(d: DataFrame): Map[String, String] =
    d.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  private def twin(edgesDir: String): Map[String, String] =
    labels(DedupOps.connectedComponents(
      ClusterLoop.currentEdges(spark, edgesDir)
        .select(col("lo").as("d1"), col("hi").as("d2"))))

  test("per-batch fold ≡ batch connectedComponents over the current edge set") {
    val root = Files.createTempDirectory("graft-clusterloop").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    for ((b, i) <- Seq(b0, b1, b2).zipWithIndex) {
      ClusterLoop.foldBatch(df(b), i.toLong, "d1", "d2", "removed",
        state, edges, out)
      val want = twin(edges)
      assert(labels(ClusterLoop.latestLabels(spark, state)) == want,
        s"state labels diverge from the batch twin after batch $i")
      assert(labels(spark.read.parquet(s"$out/batch=$i")) == want)
      if (i == 1) { // the takedown SPLIT the chain: the tail re-labeled
        assert(want("d") == "d" && want("e") == "d" && want("a") == "a",
          s"post-split labels wrong: $want")
      }
    }
    val fin = labels(ClusterLoop.latestLabels(spark, state))
    // The takedown story, spelled out: b2 re-added c-d so the chain is
    // whole again, the merged pairs share one cluster, p dropped when
    // its only edge was taken down, the no-op removal introduced
    // nothing, and the net remove+re-add kept a-b present.
    assert(Seq("a", "b", "c", "d", "e").forall(fin(_) == "a"),
      s"re-joined chain must share the min label: $fin")
    assert(fin("q") == "q" && fin("r") == "q" && fin("s") == "q")
    assert(!fin.contains("p"), "an isolated doc must drop from the map")
    assert(!fin.contains("x") && !fin.contains("y"))
  }

  test("crash replay is idempotent — even against an already-compacted store") {
    val root = Files.createTempDirectory("graft-clusterloop-rp").toString
    val (state, edges, out) = (s"$root/state", s"$root/edges", s"$root/out")
    def dirs(): Set[String] = {
      val (fs, p) = graft.sources.LakeFs.resolve(edges)
      fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSet
    }
    ClusterLoop.foldBatch(df(b0), 0L, "d1", "d2", "removed", state, edges, out)
    ClusterLoop.foldBatch(df(b1), 1L, "d1", "d2", "removed", state, edges, out)
    val after1 = labels(ClusterLoop.latestLabels(spark, state))
    // Plain replay (crash before checkpoint commit).
    ClusterLoop.foldBatch(df(b1), 1L, "d1", "d2", "removed", state, edges, out)
    assert(labels(ClusterLoop.latestLabels(spark, state)) == after1)
    // Compacting batch: cadence hits at batch 2; the store nets to one
    // dir holding only PRESENT edges.
    ClusterLoop.foldBatch(df(b2), 2L, "d1", "d2", "removed", state, edges, out,
      compactEvery = 2)
    val after2 = labels(ClusterLoop.latestLabels(spark, state))
    assert(dirs() == Set("batch=2_compact"), s"store not compacted: ${dirs()}")
    val want2 = twin(edges)
    assert(after2 == want2)
    // Replay of the compacting batch: oldEdges now ALREADY CONTAINS the
    // batch's own effects (its dir was folded into the compact target) —
    // the fold's idempotence (re-add of present edges, re-remove of
    // absent ones) must land on identical labels, and the compaction
    // pass must skip the finished target.
    ClusterLoop.foldBatch(df(b2), 2L, "d1", "d2", "removed", state, edges, out,
      compactEvery = 2)
    assert(labels(ClusterLoop.latestLabels(spark, state)) == after2)
    assert(dirs() == Set("batch=2_compact"))
  }

  test("streamed run with a mid-stream restart ≡ batch connectedComponents") {
    val root = Files.createTempDirectory("graft-clusterloop-st").toString
    val (src, state, edges, out, ckpt) =
      (s"$root/src", s"$root/state", s"$root/edges", s"$root/out", s"$root/ckpt")
    def runOnce(): Unit = {
      val q = ClusterLoop.run(
        spark.readStream.schema(df(b0).schema).parquet(src),
        "d1", "d2", "removed", state, edges, out, ckpt,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination(120000)
      q.stop()
    }
    df(b0).write.mode("append").parquet(src)
    runOnce() // STOP — mid-stream restart
    df(b1 ++ b2).write.mode("append").parquet(src)
    runOnce()
    val got = labels(ClusterLoop.latestLabels(spark, state))
    assert(got == twin(edges) && got.nonEmpty)
    assert(!got.contains("p") && got("e") == "a" && got("s") == "q")
  }
}
