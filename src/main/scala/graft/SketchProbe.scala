package graft
import org.apache.spark.sql.functions._
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-sketchprobe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    graft.sources.Catalog.register(spark, args(0))
    val big = spark.table("lineitem").select(concat(lit("k"), col("l_orderkey")).as("k"),
      repeat(md5(concat(col("l_orderkey"), col("l_linenumber"))), 10).as("payload"))
    val real = spark.table("orders").select(concat(lit("k"), col("o_orderkey")).as("k"))
      .where(col("o_orderkey") % 20 === 0)
    val fake = spark.range(1900000).select(concat(lit("zz"), col("id")).as("k"))
    val small = (real.unionByName(fake)).cache()
    val nSmall = small.count()
    def timed(n: String)(f: () => org.apache.spark.sql.DataFrame): Double = {
      f().collect(); val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f().collect(); (System.nanoTime()-t0)/1e9 }
      val m = ts.min; println(f"  $n%-18s min=$m%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}"); m
    }
    val sketch = graft.ops.SketchOps.bloomSemiSketch(small, "k", expectedItems = nSmall)
    timed("scan_only")(() => big.agg(count(lit(1))))
    timed("scan_probe")(() => big.where(graft.ops.SketchOps.bloomProbe(sketch, xxhash64(col("k")))).agg(count(lit(1))))
    timed("bloomSMJ")(() => graft.ops.SketchOps.bloomSemiJoinWith(big, "k", sketch, small, "k").agg(count(lit(1))))
    timed("plainSMJ")(() => big.join(small.withColumnRenamed("k","k2"), col("k")===col("k2"), "left_semi").agg(count(lit(1))))
    spark.stop()
  }
}
