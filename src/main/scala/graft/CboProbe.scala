package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Catalog

/** Diagnosis probe (like LakeProbe — not driver contract): what
  * ANALYZE-tier catalog statistics buy the planner at a given SF dir.
  *
  * Three regimes over the same snowflake join + selective-filter query
  * (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, region filtered):
  *
  *  1. temp views, AQE ON           — today's default path (file-size
  *     estimates + runtime re-planning);
  *  2. catalog tables + stats, CBO ON, AQE OFF — pure plan-time costing
  *     (row counts + column NDV drive broadcast/join-order with no
  *     runtime correction available);
  *  3. catalog tables + stats, CBO ON + joinReorder ON, AQE ON — the
  *     posture a 100 TB deployment wants (plan-time costing AND runtime
  *     insurance).
  *
  * MEASURED finding (sf0.1, recorded in SURVEY §6): file-size estimation
  * plus column pruning already broadcasts every side it can PROVE small —
  * stats change nothing there. The stats tier decides exactly the case
  * where neither file size nor pruning helps (wideSql: a wide self-join
  * with one side selectively filtered): size-only plans it as a
  * sort-merge join with two shuffles; AQE demotes it to broadcast only
  * at runtime, AFTER paying the map-side shuffle write; CBO + column
  * stats plan the broadcast up front — zero exchanges ever scheduled.
  * At 100 TB that scheduled-then-demoted exchange is the regression.
  */
object CboProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark: SparkSession = graft.engine.Graft.session("graft-cboprobe")
    Catalog.register(spark, dir)

    val sql =
      """select n.n_name, count(*) c, round(cast(sum(cast(l.l_extendedprice as decimal(18,4))) as double), 2) rev
        |from lineitem l
        |join orders o   on l.l_orderkey = o.o_orderkey
        |join customer c on o.o_custkey = c.c_custkey
        |join nation n   on c.c_nationkey = n.n_nationkey
        |join region r   on n.n_regionkey = r.r_regionkey
        |where r.r_name = 'ASIA' and o.o_orderpriority = '1-URGENT'
        |group by n.n_name order by n.n_name""".stripMargin

    // A selectively filtered fact side. MEASURED: size-only estimation
    // already broadcasts this one — column PRUNING scales the estimate by
    // output width, and the narrow aggregate keeps 2 of 11 columns. The
    // stats tier is NOT needed when pruning or file size can prove a side
    // small; recorded honestly (see wideSql for where it is needed).
    val filteredSql =
      """select cast(count(*) as bigint) c, round(cast(sum(cast(l.l_extendedprice as decimal(18,4))) as double), 2) rev
        |from orders o join lineitem l on o.o_orderkey = l.l_orderkey
        |where l.l_quantity > 49""".stripMargin

    // The decision only bites when NEITHER side is small by file size: a
    // lineitem self-join (both sides over the broadcast threshold), one
    // side selectively filtered, the aggregate touching every column of
    // the filtered side so pruning cannot shrink its estimate either.
    // Size-only estimation must sort-merge this; row-count × selectivity
    // (CBO + column stats) can prove the filtered side broadcastable at
    // plan time.
    val wideSql =
      """select cast(count(*) as bigint) c,
        | round(sum(lf.l_quantity + lf.l_extendedprice + lf.l_discount + lf.l_tax), 2) s1,
        | cast(sum(lf.l_partkey + lf.l_suppkey + lf.l_linenumber) as bigint) s2,
        | cast(sum(length(lf.l_returnflag) + length(lf.l_linestatus)) as bigint) s3,
        | max(lf.l_shipdate) mx,
        | round(sum(lb.l_quantity + lb.l_extendedprice + lb.l_discount + lb.l_tax), 2) t1,
        | cast(sum(lb.l_partkey + lb.l_suppkey + lb.l_linenumber) as bigint) t2,
        | cast(sum(length(lb.l_returnflag) + length(lb.l_linestatus)) as bigint) t3,
        | max(lb.l_shipdate) my
        |from lineitem lb join lineitem lf on lb.l_orderkey = lf.l_orderkey
        |where lf.l_quantity > 49""".stripMargin

    def timed(f: () => Unit): Double = {
      f(); val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    def run(label: String, text: String = sql): Unit = {
      val df = spark.sql(text)
      val sec = timed(() => { df.collect(); () })
      // AdaptiveSparkPlanExec.toString prints BOTH the final and the
      // initial plan — count only the final section or every AQE row
      // double-counts (and a runtime-demoted SMJ still reads as smj=1).
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      val smj = "SortMergeJoin".r.findAllIn(plan).length
      val exch = "Exchange hashpartitioning".r.findAllIn(plan).length
      println(f"== $label%-34s $sec%7.3f sec  bhj=$bhj smj=$smj shuffle_exchanges=$exch")
    }

    // Regime 1: temp views (Catalog.register) + AQE.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.cbo.enabled", "false")
    run("tempviews_aqe")
    run("tempviews_aqe_filtered", filteredSql)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run("tempviews_noaqe_filtered", filteredSql)
    run("tempviews_noaqe_wide", wideSql)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    run("tempviews_aqe_wide", wideSql)
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    // Catalog tables with statistics, under distinct names; column stats
    // on every join key + the filter columns.
    def reg(n: String, cols: Seq[String]): Unit = {
      Catalog.registerAnalyzed(spark, s"${n}", s"$dir/$n.parquet",
        analyzeColumns = cols)
      ()
    }
    // registerAnalyzed registers under the same logical names: temp views
    // shadow catalog tables in resolution, so drop the views first.
    Seq("lineitem", "orders", "customer", "nation", "region")
      .foreach(t => spark.catalog.dropTempView(t))
    reg("lineitem", Seq("l_orderkey", "l_quantity", "l_extendedprice"))
    reg("orders", Seq("o_orderkey", "o_custkey", "o_orderpriority"))
    reg("customer", Seq("c_custkey", "c_nationkey"))
    reg("nation", Seq("n_nationkey", "n_regionkey"))
    reg("region", Seq("r_regionkey", "r_name"))

    // Regime 2: pure plan-time costing (no join reorder yet, so any
    // regime-3 delta is attributable).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    run("catalog_stats_cbo_noaqe")
    run("catalog_stats_cbo_noaqe_filtered", filteredSql)
    run("catalog_stats_cbo_noaqe_wide", wideSql)

    // Regime 3: stats + reorder + AQE insurance.
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    run("catalog_stats_cbo_aqe")
    run("catalog_stats_cbo_aqe_filtered", filteredSql)
    run("catalog_stats_cbo_aqe_wide", wideSql)

    Seq("lineitem", "orders", "customer", "nation", "region")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))

    // Regime 4: the HISTOGRAM tier — the case plain column stats cannot
    // price. A filter on a SKEWED column (99.5% zeros, max ~1e6) under
    // uniform NDV/min/max costing estimates ~all rows, so CBO keeps a
    // sort-merge join; the equi-height histogram prices `k > 0` at ~0.5%
    // and the filtered side broadcasts AT PLAN TIME (PlanSpec pins the
    // flip; this records what it buys in seconds at probe scale). Both
    // aggregates touch every column so pruning cannot shrink either
    // side's estimate — the histogram is the only variable.
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_cbo_histo")
    val n = 2000000L
    spark.range(n).select(col("id"),
        when(col("id") % 200 === 0, col("id") * 5 + 1).otherwise(0L).as("k"),
        lpad(col("id").cast("string"), 100, "x").as("payload"))
      .write.parquet(s"$base/fact")
    spark.range(n).select(col("id"),
        lpad(col("id").cast("string"), 100, "y").as("p2"))
      .write.parquet(s"$base/big")
    Catalog.registerAnalyzed(spark, "histo_fact", s"$base/fact",
      analyzeColumns = Seq("id", "k", "payload"))
    Catalog.registerAnalyzed(spark, "histo_big", s"$base/big",
      analyzeColumns = Seq("id", "p2"))
    val skewSql =
      """select cast(count(*) as bigint) c,
        | cast(sum(length(f.payload)) as bigint) s1, cast(sum(length(b.p2)) as bigint) s2
        |from histo_fact f join histo_big b on f.id = b.id
        |where f.k > 0""".stripMargin
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    run("stats_nohisto_skewfilter", skewSql)
    Catalog.refreshStats(spark, "histo_fact", histogramColumns = Seq("k"))
    run("stats_histogram_skewfilter", skewSql)
    Seq("histo_fact", "histo_big").foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))

    spark.stop()
  }
}
