package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The shared signed-edge-store kernel, pinned directly on hand-built
  * frames (the loop specs pin it through ClusterLoop/RankLoop/LabelLoop;
  * this spec owns the kernel's own contract — within-batch add-wins,
  * last-action-wins netting, crash-safe compaction including the
  * foreign-dir and finished-target cases the loops never exercise). */
class SignedEdgeStoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def events(rows: (String, String, Boolean)*) = {
    import spark.implicits._
    rows.toSeq.toDF("src", "dst", "__rm")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("canonBatch: one action per pair, upsert beats removal within a batch") {
    val canon = SignedEdgeStore.canonBatch(
      events(("a", "b", true), ("a", "b", false), // mixed → add wins
        ("c", "d", true), ("c", "d", true),       // all removed → removal
        ("e", "f", false)),                        // plain add
      "src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(canon == Set(("a", "b", 0), ("c", "d", 1), ("e", "f", 0)),
      s"got $canon")
  }

  test("net: last action wins per pair; duplicate identical rows are harmless; set semantics") {
    import spark.implicits._
    val signed = Seq(
      // add at b=0, removed at b=2 → absent
      ("a", "b", 1, 0L), ("a", "b", -1, 2L),
      // removed at b=0, re-added at b=3 → present (one add revives after
      // ANY number of removals — set semantics, not a sum)
      ("c", "d", -1, 0L), ("c", "d", -1, 1L), ("c", "d", 1, 3L),
      // duplicate identical rows (a slice union matching through both
      // endpoints) must not disturb the max_by
      ("e", "f", 1, 5L), ("e", "f", 1, 5L),
      // removal of a never-added pair → absent, not an error
      ("x", "y", -1, 4L)).toDF("src", "dst", "sign", "b")
    assert(pairs(SignedEdgeStore.net(signed, "src", "dst")) ==
      Set(("c", "d"), ("e", "f")))
  }

  test("current on a missing dir is an empty typed frame") {
    val df = SignedEdgeStore.current(spark,
      s"${Files.createTempDirectory("graft-ses").toString}/nope", "src", "dst")
    assert(df.columns.toSeq == Seq("src", "dst") && df.count() == 0)
  }

  test("compact: nets to one dir, skips a finished target, tolerates foreign dirs") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-ses-cp").toString + "/edges"
    SignedEdgeStore.writeBatch(
      SignedEdgeStore.canonBatch(events(("a", "b", false), ("c", "d", false)),
        "src", "dst"), "src", "dst", dir, 0L)
    SignedEdgeStore.writeBatch(
      SignedEdgeStore.canonBatch(events(("a", "b", true), ("e", "f", false)),
        "src", "dst"), "src", "dst", dir, 1L)
    // A foreign dir (a crashed job's leftover) must not kill compaction.
    val (fs, root) = graft.sources.LakeFs.resolve(dir)
    spark.range(1).select(lit("junk").as("src"), lit("junk").as("dst"),
        lit(1).as("sign"), lit(0L).as("b"))
      .write.parquet(s"$dir/stray-tmp-xyz")
    SignedEdgeStore.compact(spark, dir, 2L, "src", "dst")
    val dirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs == Set("batch=2_compact"), s"store not compacted: $dirs")
    // Net survives: a-b removed at b=1, junk row was folded but is
    // PRESENT (sign +1) — compaction nets actions, it does not vet
    // content; the foreign-dir guarantee is only no-crash + deletion.
    val now = pairs(SignedEdgeStore.current(spark, dir, "src", "dst"))
    assert(now == Set(("c", "d"), ("e", "f"), ("junk", "junk")), s"got $now")
    // Finished target is never rewritten: delete one source-visible
    // fact by writing a later batch, re-compact at the SAME id — the
    // _SUCCESS-gated skip keeps the existing target and only deletes
    // the extra dir INTO it... (replay shape: the extra dir's content
    // is the replayed batch's own, already netted into the target).
    SignedEdgeStore.writeBatch(
      SignedEdgeStore.canonBatch(events(("c", "d", true)), "src", "dst"),
      "src", "dst", dir, 1L)
    SignedEdgeStore.compact(spark, dir, 2L, "src", "dst")
    assert(fs.listStatus(root).filter(_.isDirectory).length == 1)
    // The finished target was kept verbatim — the late c-d removal dir
    // was deleted without being folded (exactly the crash-replay
    // contract: a replayed batch's actions were already in the target).
    assert(pairs(SignedEdgeStore.current(spark, dir, "src", "dst")) == now)
  }
}
