package graft
import org.apache.spark.sql.functions._
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-annprobe")
    graft.sources.Catalog.register(spark, args(0))
    val e = spark.table("embeddings")
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val n = e.count()
    def timed(f: () => org.apache.spark.sql.DataFrame): Double = {
      f().collect(); val t0 = System.nanoTime(); f().collect(); (System.nanoTime()-t0)/1e9
    }
    val probes = e.where(col("vec_id") > maxId - 100)
    def gal(k0: Int) = e.where(col("vec_id") >= k0 && col("vec_id") <= maxId - 100)
    def cen(k0: Int) = e.where(col("vec_id") < k0)
    val tF8  = timed(() => graft.ops.Ann.topKQuantizedIvf(probes, gal(8), cen(8), 10).agg(count(lit(1))))
    val tF64 = timed(() => graft.ops.Ann.topKQuantizedIvf(probes, gal(64), cen(64), 10).agg(count(lit(1))))
    val tFlat = timed(() => graft.ops.Ann.topKQuantized(probes, gal(8), 10).agg(count(lit(1))))
    println(f"ANNPROBE n=$n fusedK8=$tF8%.2f fusedK64=$tF64%.2f flat=$tFlat%.2f")
    spark.stop()
  }
}
