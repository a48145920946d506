package graft

import org.apache.spark.sql.functions._

import graft.ops.Ann

/** Diagnosis probe (not driver contract): where does
  * `x_embed_neardup_lsh` (neardupLshAuto at threshold 0.44 over the
  * sf0.1 embeddings) spend its ~1.7 s — the only production extra
  * still above its reference pin? Stage cuts, warm (median of 5):
  *
  *  - keys:   hyperplane bucket keys only (the md5-plane projections)
  *  - cand:   + bucket self-join candidates + distinct
  *  - full:   + the two vector attaches + cosine6 verify (bench thunk)
  *
  * Usage: runMain graft.NearDupCostProbe [sfDir]
  */
object NearDupCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-neardupcostprobe")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    graft.sources.Catalog.register(spark, sf)
    val emb = spark.table("embeddings").localCheckpoint()
    val n = emb.count()
    val bits = math.min(Ann.lshBitsFor(n), 64 / 4)
    println(s"vectors=$n bits=$bits")

    def med(f: () => Unit): Double = {
      f()
      val xs = Seq.fill(5) {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      xs.sorted.apply(2)
    }
    def p(name: String, sec: Double): Unit = println(f"== $name%-10s $sec%7.3f sec")

    val bkCols = (1 to 4).map { t =>
      concat(lit(s"t$t:"), Ann.hyperplaneBucket(col("embedding"), bits, (t - 1) * bits + 1))
    }
    def keys = emb.select(col("vec_id"), explode(array(bkCols: _*)).as("bk"))
    p("keys", med(() => { keys.agg(count(lit(1))).head(); () }))
    def cand = keys.select(col("vec_id").as("d1"), col("bk"))
      .join(keys.select(col("vec_id").as("d2"), col("bk").as("bk2")),
        col("bk") === col("bk2") && col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    p("cand", med(() => { cand.agg(count(lit(1))).head(); () }))
    p("full", med(() => {
      Ann.neardupLshAuto(emb, threshold = 0.44, knownCount = n)
        .agg(count(lit(1)).as("pairs")).head(); ()
    }))
    // How many candidates / final pairs — the density context.
    println(s"cand_rows=${cand.count()} pairs=${Ann.neardupLshAuto(emb, 0.44, knownCount = n).count()}")
    spark.stop()
  }
}
