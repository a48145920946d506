package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Diagnosis probe (not driver contract): where do `x_minhash_lsh_pairs_1k`'s
  * ~2.1 s actually go? The bench thunk is `minhashLsh(tokenSet(docs<1000),
  * k=8, bands=4, 0.8)` — signature aggregation → band keys → bucket join →
  * token-level Jaccard verify, one fused lazy plan. This probe times, warm
  * (one untimed priming run each, median of 3), each stage cut at a count:
  *
  *  - tokens:     the distinct (doc_id, w) token relation alone
  *  - sig:        + 8-hash MinHash signature aggregation
  *  - band:       + band-key explode
  *  - cand:       + bucket self-join candidates (still fused)
  *  - verify_tok: token-level verify over MATERIALIZED candidates + tokens
  *  - verify_cmp: compact array verify over the same materialized inputs
  *  - fused:      the full bench thunk
  *
  * Usage: runMain graft.MinhashCostProbe [sfDir]
  */
object MinhashCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-minhashcostprobe")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.sources.Catalog.register(spark, sf)
    val docs = spark.table("documents").where(col("doc_id") < 1000).localCheckpoint()
    docs.count()

    def med(f: () => Unit): Double = {
      f()
      val xs = Seq.fill(3) {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      xs.sorted.apply(1)
    }
    def p(name: String, sec: Double): Unit = println(f"== $name%-14s $sec%7.3f sec")

    def toks = DedupOps.tokenSet(docs, col("doc_id"), col("text"))
    def sig = DedupOps.minhashSignatures(toks, 8)
    def band = DedupOps.lshBandKeys(sig, 4, 2)
    def cand = DedupOps.lshCandidates(band)

    p("tokens", med(() => { toks.agg(count(lit(1))).head(); () }))
    p("sig", med(() => { sig.agg(count(lit(1))).head(); () }))
    p("band", med(() => { band.agg(count(lit(1))).head(); () }))
    p("cand", med(() => { cand.agg(count(lit(1))).head(); () }))

    val toksM = toks.localCheckpoint(); toksM.count()
    val candM = cand.localCheckpoint(); candM.count()
    p("verify_tok", med(() => {
      DedupOps.jaccardVerify(toksM, candM, 0.8).agg(count(lit(1))).head(); () }))
    p("verify_cmp", med(() => {
      DedupOps.jaccardVerifyCompact(toksM, candM, 0.8).agg(count(lit(1))).head(); () }))
    p("fused", med(() => {
      DedupOps.minhashLsh(toks, 8, 4, 0.8).agg(count(lit(1))).head(); () }))
    // The round-12 doc-level restructure: native projection signatures +
    // merge-walk sorted-array verify (jaccard_sorted) — same output pairs.
    p("docs_fast", med(() => {
      DedupOps.minhashLshDocs(docs, col("doc_id"), col("text"), 8, 4, 0.8)
        .agg(count(lit(1))).head(); () }))
    spark.stop()
  }
}
