package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 probe: time + shuffle-meter GraphOps.hits on the bench graph
  * (lineitem part→supplier co-occurrence, 3 iterations) — evidence for the
  * loop-invariant edge co-partitioning rewrite. Diagnosis tooling, not part
  * of the driver contract. */
object HitsOptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = graft.engine.Graft.session("graft-hitsopt-probe")
    graft.sources.Catalog.register(spark, sfDir)
    val edges = spark.table("lineitem")
      .select(col("l_partkey").as("src"), col("l_suppkey").as("dst"))
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.ops.GraphOps.hits(edges, iterations = 3)
        .agg(count(lit(1)).as("n"), round(max(col("auth")), 6).as("m"))
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    (1 to 3).foreach { i =>
      val (t, rd, wr) = ShuffleMeter.measure(spark)(run())
      println(f"HITSOPT run$i: $t%.3f s, shuffle read $rd%.1f MB written $wr%.1f MB")
    }
    spark.stop()
  }
}
