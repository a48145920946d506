package graft

import org.apache.spark.sql.functions._

/** Diagnosis probe (not driver contract): the round-9 question — is
  * model-based language ID's k-model scan hot at bench scale, and what
  * does the fused `lang_classify` expression buy over the composed
  * k-×-`lm_score` lowering?
  *
  * Trains k models on doc_id-mod slices of the SF dir's documents table
  * (maintenance, untimed), then times classify-all-docs under both
  * lowerings (warm pass + median of 3, the Bench protocol).
  *
  * Usage: runMain graft.LangProbe <sfDir> [k]
  */
object LangProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-langprobe")
    graft.sources.Catalog.register(spark, args(0))
    val k = if (args.length > 1) args(1).toInt else 4

    val docs = spark.table("documents").select("doc_id", "text")
    val models = (0 until k).map { m =>
      val tbl = graft.ops.TextOps.ngramModel(
        docs.where(col("doc_id") % k === m), col("text")).persist()
      tbl.count()
      val bytes = graft.ops.TextOps.ngramModelBytes(tbl)
      tbl.unpersist()
      s"l$m" -> bytes
    }.toMap

    def timed(thunk: () => Unit): Double = {
      thunk()
      val xs = Seq.fill(3) {
        val t0 = System.nanoTime(); thunk(); (System.nanoTime() - t0) / 1e9
      }
      xs.sorted.apply(1)
    }
    def classify(c: org.apache.spark.sql.Column): Unit =
      docs.select(c.as("l")).groupBy("l").count().collect()

    val tOne = timed(() => docs.select(
      graft.ops.TextOps.lmScore(col("text"), models("l0")).getField("score").as("s"))
      .agg(avg("s")).collect())
    val tComposed = timed(() =>
      classify(graft.ops.TextOps.langClassifyComposed(col("text"), models)))
    val tFused = timed(() =>
      classify(graft.ops.TextOps.langClassify(col("text"), models)))
    println(f"== lm_score_single       $tOne%8.3f sec")
    println(f"== classify_composed_k$k  $tComposed%8.3f sec  (${tComposed / tOne}%.1fx single)")
    println(f"== classify_fused_k$k     $tFused%8.3f sec  (${tFused / tOne}%.1fx single, ${tComposed / tFused}%.1fx faster than composed)")
    spark.stop()
  }
}
