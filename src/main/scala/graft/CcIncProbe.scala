package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diagnosis probe (not driver contract): deletion-aware
  * connected-components maintenance — after a small mixed batch (edge
  * removals that split + additions that merge), does
  * [[graft.ops.DedupOps.connectedComponentsInc]]'s affected-cone fold
  * beat the cold pointer-jumping recompute over the whole store, and by
  * how much shuffle? Graph shape: `nComp` chain components of `size`
  * nodes each (plus intra-component extra edges) — the many-medium-
  * components regime a dedup cluster map actually is, where the cone
  * is a tiny fraction of the store. Batch: cut the chain in `touch`
  * components (splits) and add `touch/2` cross-component bridges
  * (merges). Verifies fold ≡ cold label-for-label.
  *
  * Usage: runMain graft.CcIncProbe [nComp] [size] [touch]
  */
object CcIncProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-ccincprobe")
    val nComp = if (args.nonEmpty) args(0).toInt else 10000
    val size = if (args.length > 1) args(1).toInt else 100
    val touch = if (args.length > 2) args(2).toInt else 20

    def node(c: Column, j: Column): Column = c * size + j
    // Chains (connectivity) + a second intra-component edge layer.
    // NB: Spark's `/` on integers is DOUBLE division — floor+cast keeps
    // the component index integral.
    def comp(of: Int): Column = floor(col("id") / of).cast("long")
    val chains = spark.range(nComp.toLong * (size - 1)).select(
      node(comp(size - 1), col("id") % (size - 1)).as("d1"),
      node(comp(size - 1), col("id") % (size - 1) + 1).as("d2"))
    val extras = spark.range(nComp.toLong * (size / 2)).select(
      node(comp(size / 2), (col("id") * 13 + 5) % size).as("d1"),
      node(comp(size / 2), (col("id") * 29 + 11) % size).as("d2"))
    val old = chains.unionAll(extras).localCheckpoint()
    println(s"== edges=${old.count()} comps=$nComp size=$size touch=$touch")

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val (r, rd, wr) = ShuffleMeter.measure(spark)(f)
      println(f"== $tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f sec  " +
        f"shuffle read=$rd%8.1f MB written=$wr%8.1f MB")
      r
    }
    val prior = t("cold base (state build)") {
      val p = graft.ops.DedupOps.connectedComponents(old).localCheckpoint()
      p.count(); p
    }
    import spark.implicits._
    // Splits: cut chain edge (mid, mid+1) in the first `touch` components.
    val removed = (0 until touch).map { c =>
      (c.toLong * size + size / 2, c.toLong * size + size / 2 + 1)
    }.toDF("d1", "d2").localCheckpoint()
    // Merges: bridge component 2k ↔ 2k+1 for the next `touch/2` pairs.
    val added = (0 until touch / 2).map { k =>
      val (ca, cb) = (touch + 2 * k, touch + 2 * k + 1)
      (ca.toLong * size + 3, cb.toLong * size + 7)
    }.toDF("d1", "d2").localCheckpoint()
    val newGraph = old.join(
        removed.select(least(col("d1"), col("d2")).as("lo"),
          greatest(col("d1"), col("d2")).as("hi")),
        least(col("d1"), col("d2")) === col("lo") &&
          greatest(col("d1"), col("d2")) === col("hi"), "left_anti")
      .unionAll(added).localCheckpoint()
    val cold = t("cold recompute") {
      val c = graft.ops.DedupOps.connectedComponents(newGraph).localCheckpoint()
      c.count(); c
    }
    val fold = t("fold (ccInc)") {
      val f = graft.ops.DedupOps
        .connectedComponentsInc(prior, old, added, removed).localCheckpoint()
      f.count(); f
    }
    val diff = cold.withColumnRenamed("label", "cl")
      .join(fold, Seq("doc"), "full")
      .where(col("cl").isNull || col("label").isNull || col("cl") =!= col("label"))
      .count()
    println(s"== verify: label mismatches = $diff (must be 0), " +
      s"cold rows=${cold.count()} fold rows=${fold.count()}")
    spark.stop()
  }
}
