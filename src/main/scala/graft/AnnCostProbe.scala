package graft

import org.apache.spark.sql.functions._

/** Diagnosis probe (not driver contract): where do `x_ann_ivf_int8`'s
  * ~2.6 s actually go? The bench thunk is
  * `topKQuantizedIvf(probes=last 100, gallery, centroids=first 8, k=10)`
  * = ivfIndex(gallery) + the probe path over it. This probe times, warm
  * (one untimed priming run each, median of 3):
  *
  *  - maxid:   the thunk's max(vec_id) driver agg
  *  - index:   ivfIndex build alone (assignment + quantize, materialized)
  *  - probe:   topKQuantizedIvfWithIndex over a pre-materialized index
  *  - fused:   the full bench thunk (≈ maxid + index + probe + plan glue)
  *
  * Usage: runMain graft.AnnCostProbe [sfDir]
  */
object AnnCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-anncostprobe")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.sources.Catalog.register(spark, sf)
    val e = spark.table("embeddings").localCheckpoint()
    val n = e.count()
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val probes = e.where(col("vec_id") > maxId - 100)
    val gallery = e.where(col("vec_id") >= 8 && col("vec_id") <= maxId - 100)
    val cents = e.where(col("vec_id") < 8)

    def med(f: () => Unit): Double = {
      f()
      val xs = Seq.fill(3) {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      xs.sorted.apply(1)
    }
    def p(name: String, sec: Double): Unit = println(f"== $name%-10s $sec%7.3f sec")

    p("maxid", med(() => { e.agg(max(col("vec_id"))).head(); () }))
    p("index", med(() => {
      graft.ops.Ann.ivfIndex(gallery, cents).agg(count(lit(1))).head(); () }))
    val idx = graft.ops.Ann.ivfIndex(gallery, cents).localCheckpoint()
    idx.count()
    p("probe", med(() => {
      graft.ops.Ann.topKQuantizedIvfWithIndex(probes, idx, gallery, cents, 10)
        .agg(count(lit(1))).head(); () }))
    // Sub-stages of the probe path, each cut at a count: cell pick alone,
    // + candidate join, + coarse cut, then the full re-ranked form above.
    p("probe:cells", med(() => {
      graft.ops.Ann.probeStage(probes, idx, cents, 10, stage = 1)
        .agg(count(lit(1))).head(); () }))
    p("probe:cand", med(() => {
      graft.ops.Ann.probeStage(probes, idx, cents, 10, stage = 2)
        .agg(count(lit(1))).head(); () }))
    p("probe:coarse", med(() => {
      graft.ops.Ann.probeStage(probes, idx, cents, 10, stage = 3)
        .agg(count(lit(1))).head(); () }))
    p("fused", med(() => {
      val m = e.agg(max(col("vec_id"))).head().getLong(0)
      graft.ops.Ann.topKQuantizedIvf(
          e.where(col("vec_id") > m - 100),
          e.where(col("vec_id") >= 8 && col("vec_id") <= m - 100),
          e.where(col("vec_id") < 8), k = 10)
        .agg(count(lit(1))).head(); () }))
    println(s"== n=$n maxId=$maxId")
    spark.stop()
  }
}
