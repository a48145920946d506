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

  test("compact: nets to one dir, skips a finished target, ignores foreign dirs wholesale") {
    val dir = Files.createTempDirectory("graft-ses-cp").toString + "/edges"
    SignedEdgeStore.writeBatch(
      SignedEdgeStore.canonBatch(events(("a", "b", false), ("c", "d", false)),
        "src", "dst"), "src", "dst", dir, 0L)
    SignedEdgeStore.writeBatch(
      SignedEdgeStore.canonBatch(events(("a", "b", true), ("e", "f", false)),
        "src", "dst"), "src", "dst", dir, 1L)
    // A foreign dir (another tool's spill) is OUTSIDE the naming
    // contract: never read (its content could be any format), never
    // folded into the store, never deleted. A non-parquet file inside
    // it proves reads skip it entirely.
    val (fs, root) = graft.sources.LakeFs.resolve(dir)
    val stray = new org.apache.hadoop.fs.Path(root, "stray-tmp-xyz")
    fs.mkdirs(stray)
    val out = fs.create(new org.apache.hadoop.fs.Path(stray, "junk.json"))
    out.write("{\"not\": \"parquet\"}".getBytes("UTF-8")); out.close()
    SignedEdgeStore.compact(spark, dir, 2L, "src", "dst")
    val dirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs == Set("batch=2_compact", "stray-tmp-xyz"),
      s"owned dirs compacted, the stray left alone: $dirs")
    val now = pairs(SignedEdgeStore.current(spark, dir, "src", "dst"))
    assert(now == Set(("c", "d"), ("e", "f")), s"got $now")
    // Finished target is never rewritten: re-write batch 1's dir (the
    // replay shape — its actions are already inside the target) and
    // re-compact at the SAME id: the _SUCCESS-gated skip keeps the
    // target verbatim and the replayed dir deletes without folding.
    SignedEdgeStore.writeBatch(
      SignedEdgeStore.canonBatch(events(("c", "d", true)), "src", "dst"),
      "src", "dst", dir, 1L)
    SignedEdgeStore.compact(spark, dir, 2L, "src", "dst")
    assert(fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName).toSet == Set("batch=2_compact", "stray-tmp-xyz"))
    assert(pairs(SignedEdgeStore.current(spark, dir, "src", "dst")) == now)
  }

  test("readStore refuses a pre-signed-format (append-only) store loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ses-old").toString + "/edges"
    // An old-format dir: (src, dst) only — what the pre-round-14
    // append-only loops wrote. Silent netting over it would drop edges.
    Seq(("a", "b")).toDF("src", "dst").write.parquet(s"$dir/batch=0")
    val e = intercept[IllegalArgumentException] {
      SignedEdgeStore.readStore(spark, dir, "src", "dst")
    }
    assert(e.getMessage.contains("rebuild"), e.getMessage)
  }

  test("format guard is per-dir, not listing-order-dependent; compact refuses too") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ses-mix").toString + "/edges"
    // The resumed-stream shape: a NEW signed dir whose name lists BEFORE
    // the old-format dir ('batch=10' < 'batch=9_compact' alphabetically),
    // so unified schema sampling would take the new footer, null-fill the
    // old rows, and net every pre-migration edge to nothing. The per-dir
    // guard must refuse regardless of listing order — on reads AND on
    // compaction (which would otherwise DELETE the old dir after the
    // lossy fold).
    Seq(("a", "b")).toDF("src", "dst").write.parquet(s"$dir/batch=9_compact")
    SignedEdgeStore.writeBatch(
      SignedEdgeStore.canonBatch(events(("c", "d", false)), "src", "dst"),
      "src", "dst", dir, 10L)
    intercept[IllegalArgumentException] {
      SignedEdgeStore.readStore(spark, dir, "src", "dst").collect()
    }
    intercept[IllegalArgumentException] {
      SignedEdgeStore.compact(spark, dir, 11L, "src", "dst")
    }
    // Nothing was deleted by the refused compaction.
    val (fs, root) = graft.sources.LakeFs.resolve(dir)
    assert(fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName).toSet ==
      Set("batch=9_compact", "batch=10"))
  }
}
