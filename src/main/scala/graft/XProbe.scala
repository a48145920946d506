package graft

import org.apache.spark.sql.SparkSession

/** Round-15 probe: run selected Bench extras in isolation with the bench's
  * warm + median-of-N protocol plus a shuffle meter — per-extra before/after
  * evidence without the full suite. Diagnosis tooling, not driver contract.
  *
  * Usage: runMain graft.XProbe <name[,name...]> [samples]
  */
object XProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val samples = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = graft.engine.Graft.session("graft-xprobe")
    graft.sources.Catalog.register(spark, sfDir)
    val extras = Bench.extras(spark).toMap
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    names.foreach { name =>
      val thunk = extras(name)
      println(s"XPROBE $name first-run rows: " +
        thunk().collect().map(_.toString).mkString("; ")) // warm + result echo
      val timed = Seq.fill(samples) {
        ShuffleMeter.measure(spark) {
          val t0 = System.nanoTime()
          thunk().collect()
          (System.nanoTime() - t0) / 1e9
        }
      }
      val (ts, rds, wrs) = (timed.map(_._1), timed.map(_._2), timed.map(_._3))
      println(f"XPROBE $name median ${median(ts)}%.3f s (samples ${ts.map(t => f"$t%.3f").mkString(",")}) " +
        f"shuffle read ${median(rds)}%.1f MB written ${median(wrs)}%.1f MB")
    }
    spark.stop()
  }
}
