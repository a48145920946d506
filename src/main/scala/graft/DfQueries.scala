package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Ann, DedupOps, SketchOps, TemporalOps, TextOps, VectorOps}

/** DataFrame-API implementations of the contract (the E2 entry point of
  * SURVEY.md §3.2). Each impl shadows the declared SQL for the same query
  * name in [[Queries.run]] and must lower to identical semantics — the
  * sf0.01 cross-engine hash gate ([[LocalVerify]] + the driver's DuckDB
  * compare) verifies every one of them, so the ops layer
  * ([[graft.ops.TextOps]]/[[graft.ops.DedupOps]]/[[graft.ops.Ann]]) is
  * oracle-tested end to end, not just unit-tested.
  *
  * Output column names and order match the declared SQL exactly: the local
  * canonicalizer hashes cells in column order, and the driver's compare
  * keys on names.
  */
object DfQueries {

  private val dec: DecimalType = DecimalType(18, 4)

  /** Exact money sum surfaced as a double on the value's 4dp grid
    * (SURVEY.md H2/H3 + the driver-compare decimal hazard). */
  private def moneySum(c: Column): Column =
    round(sum(c.cast(dec)).cast("double"), 4)

  private def t(s: SparkSession, name: String): DataFrame = s.table(name)

  type Impl = (SparkSession, String) => DataFrame

  def impls: Map[String, Impl] = relational ++ analytic ++ textAndVector

  private def relational: Map[String, Impl] = Map(
    "q01_scan_filter_project" -> { (s, _) =>
      t(s, "lineitem")
        .where(col("l_quantity") > 45 &&
          col("l_shipdate") >= expr("timestamp '1997-01-01 00:00:00'"))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net"))
        .orderBy("l_orderkey", "l_linenumber").limit(100)
    },

    "q02_filter_in_like" -> { (s, _) =>
      t(s, "part")
        .where(col("p_type").isin("PROMO", "ECONOMY") && col("p_name").like("%a%"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey").limit(100)
    },

    "q04_having" -> { (s, _) =>
      t(s, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("c"), moneySum(col("o_totalprice")).as("s"))
        .where(col("c") >= 14)
        .orderBy("o_custkey")
    },

    "q05_count_distinct" -> { (s, _) =>
      t(s, "orders").agg(
        countDistinct(col("o_custkey")).as("a"),
        countDistinct(col("o_orderpriority")).as("b"),
        countDistinct(col("o_orderstatus")).as("c"))
    },

    "q06_distinct" -> { (s, _) =>
      t(s, "lineitem").select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q09_join_full" -> { (s, _) =>
      val a = t(s, "orders").where(col("o_orderstatus") === "F")
        .groupBy(col("o_orderpriority").as("ka")).agg(count(lit(1)).as("ca"))
      val b = t(s, "events")
        .groupBy(col("event_type").as("kb")).agg(count(lit(1)).as("cb"))
      a.join(b, col("ka") === col("kb"), "full")
        .select(coalesce(col("ka"), col("kb")).as("k"), col("ca"), col("cb"))
        .orderBy("k")
    },

    "q10_join_semi_exists" -> { (s, _) =>
      t(s, "part")
        .join(t(s, "lineitem").where(col("l_quantity") > 49),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey").limit(100)
    },

    "q11_join_anti" -> { (s, _) =>
      t(s, "customer")
        .join(t(s, "orders").where(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey").limit(100)
    },

    "q12_join_cross" -> { (s, _) =>
      val r1 = t(s, "region").select(col("r_name").as("a"))
      val r2 = t(s, "region").select(col("r_name").as("b"))
      r1.crossJoin(r2).orderBy("a", "b")
    },

    "q13_join_theta" -> { (s, _) =>
      // Eager aggregation instead of pair enumeration: the theta join's
      // COUNT is Σ_size c(size) × (#smaller in brand) over per-(brand,size)
      // counts — O(parts) + a window over the tiny size domain, vs the
      // self-join's per-brand quadratic blowup (measured 290s at 200k parts;
      // this shape runs in ~1s).
      val cnt = t(s, "part").groupBy(col("p_brand"), col("p_size"))
        .agg(count(lit(1)).as("c"))
      val below = Window.partitionBy(col("p_brand")).orderBy(col("p_size"))
        .rowsBetween(Window.unboundedPreceding, -1)
      cnt.withColumn("smaller", sum(col("c")).over(below))
        .groupBy("p_brand")
        .agg(sum(col("c") * coalesce(col("smaller"), lit(0L))).as("pairs"))
        // The inner theta join emits NO row for a brand with zero
        // qualifying pairs (all parts one size); the eager aggregate must
        // drop those brands too or the lowerings diverge.
        .where(col("pairs") > 0)
        .orderBy("p_brand")
    },

    "q14_join_range_band" -> { (s, _) =>
      // Bucketed band join (ops/TemporalOps): both sides binned to the band
      // width and joined on (user, bucket) — each row meets a ~2-bin
      // neighborhood instead of every same-user row (per-user quadratic).
      val e1 = t(s, "events").where(col("event_type") === "click")
        .select(col("event_id").as("a"), col("user_id"), col("ts").as("ts1"))
      val e2 = t(s, "events").where(col("event_type") === "purchase")
        .select(col("event_id").as("b"), col("user_id"), col("ts").as("ts2"))
      TemporalOps.timeBandJoin(e1, e2, "user_id", "ts1", "ts2", 300L)
        .select("a", "b")
        .orderBy("a", "b").limit(100)
    },

    "q15_asof_correlated" -> { (s, _) =>
      // Correlated scalar max → union + last_value window (ops/TemporalOps):
      // ONE shuffle on the user key and an in-partition sort — never the
      // (purchase × earlier-click) pair explosion, which is quadratic in
      // events-per-user exactly where skew lives.
      val p = t(s, "events").where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = t(s, "events").where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"))
      TemporalOps.asofJoin(p, c, "user_id", "ts", "cts", Seq("cts"))
        .select(col("event_id"), col("cts").as("last_click"))
        .orderBy("event_id").limit(200)
    },

    "q21_union" -> { (s, _) =>
      t(s, "orders").where(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("x"))
        .union(t(s, "customer").where(col("c_acctbal") < 0)
          .select(col("c_custkey").as("x")))
        .distinct()
        .orderBy("x").limit(100)
    },

    "q22_intersect_except" -> { (s, _) =>
      val i = t(s, "orders").where(col("o_orderstatus") === "P")
        .select(col("o_custkey").as("x"))
        .intersect(t(s, "customer").where(col("c_acctbal") > 0)
          .select(col("c_custkey").as("x")))
        .select(col("x"), lit("i").as("tag"))
      val e = t(s, "customer").select(col("c_custkey").as("x"))
        .except(t(s, "orders").select(col("o_custkey").as("x")))
        .select(col("x"), lit("e").as("tag"))
      i.unionAll(e).orderBy("tag", "x").limit(200)
    },

    "q23_string_funcs" -> { (s, _) =>
      t(s, "part").select(col("p_partkey"),
          upper(col("p_name")).as("u"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 5).as("s"),
          length(col("p_name")).as("len"),
          replace(col("p_type"), lit("A"), lit("@")).as("rep"),
          trim(concat(lit(" "), col("p_name"), lit(" "))).as("tr"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("pad"),
          reverse(col("p_brand")).as("rev"))
        .orderBy("p_partkey").limit(100)
    },

    "q24_regexp" -> { (s, _) =>
      t(s, "documents")
        .select(col("doc_id"), regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"))
        .orderBy("doc_id").limit(100)
    },

    "q25_date_funcs" -> { (s, _) =>
      val plus30 = col("o_orderdate") + expr("interval 30 day")
      t(s, "orders").select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_trunc("month", col("o_orderdate")).as("mo"),
          plus30.as("plus30"),
          datediff(plus30.cast("date"), col("o_orderdate").cast("date")).as("dd"))
        .orderBy("o_orderkey").limit(100)
    },

    "q26_math_funcs" -> { (s, _) =>
      t(s, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_discount") - 0.05), 4).as("ab"),
          floor(col("l_quantity")).cast("bigint").as("fl"),
          ceil(col("l_quantity")).cast("bigint").as("ce"),
          round(sqrt(col("l_extendedprice")), 4).as("sq"),
          round(pow(col("l_discount") + 1, 2), 6).as("pw"),
          (col("l_partkey") % 7).as("md"),
          signum(col("l_discount") - 0.05).cast("int").as("sg"),
          round(log(col("l_extendedprice")), 6).as("lg"))
        .orderBy("l_orderkey", "l_linenumber").limit(100)
    },

    "q27_case_cast_coalesce" -> { (s, _) =>
      t(s, "orders").select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("st"),
          floor(col("o_totalprice")).cast("bigint").as("ti"))
        .orderBy("o_orderkey").limit(200)
    },

    "q28_json" -> { (s, _) =>
      t(s, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id").limit(200)
    },

    "q29_array_ops" -> { (s, _) =>
      t(s, "embeddings").select(col("vec_id"),
          size(col("embedding")).as("n"),
          element_at(col("embedding"), 1).as("e1"),
          round(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
            (a, x) => a + x.cast("double")), 4).as("s8"),
          array_contains(col("embedding"), element_at(col("embedding"), 1)).as("has1"))
        .orderBy("vec_id").limit(100)
    },

    "q30_collect_sorted" -> { (s, _) =>
      t(s, "lineitem").groupBy("l_orderkey")
        .agg(array_join(
          transform(sort_array(collect_list(col("l_linenumber"))), _.cast("string")),
          ",").as("ls"))
        .orderBy("l_orderkey").limit(100)
    },

    "q41_scalar_subquery" -> { (s, _) =>
      val thr = t(s, "orders").agg((max(col("o_totalprice")) * 0.5).as("thr"))
      t(s, "orders").crossJoin(broadcast(thr))
        .where(col("o_totalprice") > col("thr"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey").limit(200)
    },

    "q42_in_subquery" -> { (s, _) =>
      t(s, "customer")
        .join(t(s, "orders").where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey").limit(200)
    },
  )

  /** Aggregations, windows, grouping extensions, event-time batch forms and
    * the classic text workloads. */
  private def analytic: Map[String, Impl] = Map(
    "q03_agg_tpch1_decimal" -> { (s, _) =>
      t(s, "lineitem")
        .where(col("l_shipdate") <= expr("timestamp '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          moneySum(col("l_quantity")).as("sq"),
          moneySum(col("l_extendedprice")).as("sp"),
          round(sum(col("l_extendedprice").cast(dec) *
            (lit(1) - col("l_discount")).cast(dec)).cast("double"), 4).as("net"),
          count(lit(1)).as("c"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    "q07_join_inner" -> { (s, _) =>
      t(s, "customer").where(col("c_mktsegment") === "BUILDING")
        .join(t(s, "orders"), col("c_custkey") === col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderstatus")
        .orderBy("c_custkey", "o_orderkey").limit(100)
    },

    "q08_join_left" -> { (s, _) =>
      t(s, "customer")
        .join(t(s, "orders"),
          col("c_custkey") === col("o_custkey") && col("o_totalprice") > 400000,
          "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n"))
        .orderBy("c_custkey").limit(100)
    },

    "q77_join_right" -> { (s, _) =>
      t(s, "orders")
        .join(t(s, "customer"),
          col("o_custkey") === col("c_custkey") && col("o_totalprice") > 400000,
          "right")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n"))
        .orderBy("c_custkey").limit(100)
    },

    "q16_window_ranking" -> { (s, _) =>
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val byKey = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      t(s, "orders").select(col("o_orderkey"), col("o_custkey"),
          row_number().over(byPrice).as("rn"),
          rank().over(byPrice).as("rk"),
          dense_rank().over(byPrice).as("dr"),
          ntile(4).over(byKey).as("nt"))
        .orderBy("o_custkey", "o_orderkey").limit(200)
    },

    "q19_topk_per_group" -> { (s, _) =>
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(byPrice).as("rn"))
        .where(col("rn") <= 3)
        .orderBy("o_custkey", "rn").limit(300)
    },

    "q20_sort_offset" -> { (s, _) =>
      t(s, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .offset(100).limit(50)
    },

    "q31_wordcount" -> { (s, _) =>
      t(s, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w"))
    },

    "q33_dedup_exact" -> { (s, _) =>
      DedupOps.exactDupGroups(t(s, "documents"), col("doc_id"), col("text"))
        .orderBy("h").limit(100)
    },

    "q34_jaccard_neardup" -> { (s, _) =>
      val toks = DedupOps.tokenSet(
        t(s, "documents").where(col("doc_id") < 200), col("doc_id"), col("text"))
      DedupOps.pairwiseJaccard(toks, "w", 0.8).orderBy("d1", "d2").limit(200)
    },

    "q35_cosine_topk" -> { (s, _) =>
      Ann.cosineTopK(t(s, "embeddings"), probeId = 0, k = 20)
    },

    "q36_knn" -> { (s, _) =>
      val emb = t(s, "embeddings")
      Ann.knn(emb.where(col("vec_id") < 20), emb.where(col("vec_id") >= 20))
        .orderBy("p_id")
    },

    "q38_tumbling_window" -> { (s, _) =>
      t(s, "events")
        .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
        .agg(count(lit(1)).as("c"), moneySum(col("value")).as("v"))
        .orderBy("w", "event_type").limit(500)
    },

    "q40_pivot_manual" -> { (s, _) =>
      t(s, "events").groupBy("user_id").agg(
          count(when(col("event_type") === "click", 1)).as("clicks"),
          count(when(col("event_type") === "view", 1)).as("n_views"),
          round(sum(when(col("event_type") === "purchase", col("value").cast(dec))
            .otherwise(lit(0).cast(dec))).cast("double"), 4).as("purchase_v"))
        .orderBy("user_id").limit(200)
    },

    "q48_minmax_by" -> { (s, _) =>
      t(s, "orders").groupBy("o_custkey").agg(
          max_by(col("o_orderstatus"), col("o_orderkey")).as("last_st"),
          min_by(col("o_orderstatus"), col("o_orderkey")).as("first_st"),
          max(col("o_orderkey")).as("mx"))
        .orderBy("o_custkey").limit(200)
    },

    "q17_window_analytic" -> { (s, _) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, "events").select(col("event_id"), col("user_id"),
          lag(col("value"), 1).over(w).as("pv"),
          lead(col("value"), 1).over(w).as("nv"),
          first(col("value")).over(w).as("fv"),
          last(col("value")).over(wAll).as("lv"))
        .orderBy("user_id", "event_id").limit(300)
    },

    "q18_window_frames" -> { (s, _) =>
      val wRows = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(-3, 0)
      val wRange = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice")).rangeBetween(-50000, 0)
      t(s, "orders").select(col("o_orderkey"), col("o_custkey"),
          round(sum(col("o_totalprice")).over(wRows), 2).as("s3"),
          round(sum(col("o_totalprice").cast(dec)).over(wRange).cast("double"), 4).as("rs"),
          count(lit(1)).over(wRange).as("rc"))
        .orderBy("o_custkey", "o_orderkey").limit(200)
    },

    "q32_bigrams" -> { (s, _) =>
      val tok = t(s, "documents").select(col("doc_id"),
        posexplode(TextOps.tokens(col("text")))).toDF("doc_id", "pos", "w")
      val t2 = tok.select(col("doc_id").as("d2"), col("pos").as("p2"), col("w").as("w2"))
      tok.join(t2, col("doc_id") === col("d2") && col("p2") === col("pos") + 1)
        .select(concat(col("w"), lit(" "), col("w2")).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("bg")).limit(50)
    },

    "q37_sessionize" -> { (s, _) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val prev = lag(col("ts"), 1).over(w)
      val brk = when(prev.isNull ||
        col("ts") - prev > expr("interval 30 minute"), 1).otherwise(0)
      t(s, "events")
        .select(col("user_id"), col("ts"), col("event_id"), brk.as("brk"))
        .select(col("user_id"),
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("sid"))
        .groupBy("user_id").agg(countDistinct(col("sid")).as("n_sessions"))
        .orderBy("user_id").limit(200)
    },

    "q39_sliding_window" -> { (s, _) =>
      val base = date_trunc("hour", col("ts"))
      val b = when(minute(col("ts")) >= 30, base + expr("interval 30 minute"))
        .otherwise(base)
      val e = t(s, "events").select(b.as("b"), col("value"))
      e.select(col("b").as("w"), col("value"))
        .unionAll(e.select((col("b") - expr("interval 30 minute")).as("w"), col("value")))
        .groupBy("w").agg(count(lit(1)).as("c"), moneySum(col("value")).as("v"))
        .orderBy("w").limit(500)
    },

    "q43_rollup" -> { (s, _) =>
      t(s, "lineitem")
        .rollup(col("l_returnflag").as("f"), col("l_linestatus").as("s"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("f").asc_nulls_first, col("s").asc_nulls_first)
    },

    "q44_cube" -> { (s, _) =>
      t(s, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("c"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("f"),
          coalesce(col("l_linestatus"), lit("ALL")).as("s"), col("c"))
        .orderBy("f", "s")
    },

    "q45_grouping_sets" -> { (s, _) =>
      t(s, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")),
            Seq(col("l_returnflag"), col("l_linestatus")),
            Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).as("gf"),
          grouping(col("l_linestatus")).as("gs"),
          count(lit(1)).as("c"))
        .select(col("l_returnflag").as("f"), col("l_linestatus").as("s"),
          col("gf"), col("gs"), col("c"))
        .orderBy(col("gf"), col("gs"),
          col("f").asc_nulls_first, col("s").asc_nulls_first)
    },

    "q46_percentile" -> { (s, _) =>
      t(s, "orders").agg(
        round(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.9)), 4).as("p90"))
    },

    "q47_stats" -> { (s, _) =>
      t(s, "lineitem").groupBy("l_returnflag").agg(
          round(stddev_samp(col("l_extendedprice")), 2).as("sd"),
          round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("co"),
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 2).as("cv"))
        .orderBy("l_returnflag")
    },

    "q49_filtered_agg" -> { (s, _) =>
      t(s, "lineitem").groupBy("l_returnflag").agg(
          count(when(col("l_quantity") > 25, 1)).as("hi"),
          count(lit(1)).as("total"),
          bool_or(col("l_discount") > 0.09).as("anyhi"),
          bool_and(col("l_quantity") > 0).as("allpos"))
        .orderBy("l_returnflag")
    },

    "q87_set_ops_all" -> { (s, _) =>
      val a = t(s, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_orderpriority").as("v"))
      val b = t(s, "orders").where(col("o_totalprice") > 450000)
        .select(col("o_orderpriority").as("v"))
      def counted(df: DataFrame, tag: String) =
        df.groupBy("v").agg(count(lit(1)).as("c")).select(lit(tag).as("op"), col("v"), col("c"))
      counted(a.intersectAll(b), "ia").unionAll(counted(a.exceptAll(b), "ea"))
        .orderBy("op", "v")
    },

    "q88_listagg" -> { (s, _) =>
      // Portable ordered-string-agg lowering: collect (sortkey, value)
      // structs, array_sort (struct order = field order, o_orderkey is
      // unique), project the value, join. Equivalent to SQL
      // listagg(...) WITHIN GROUP and deterministic by the unique key.
      t(s, "orders").where(col("o_orderkey") < 60)
        .groupBy("o_orderpriority")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("o_orderkey"), col("o_orderstatus")))),
            x => x("o_orderstatus")),
          ",").as("s"))
        .orderBy("o_orderpriority")
    },

    "q89_regexp_extract_all" -> { (s, _) =>
      t(s, "events")
        .select(col("event_id"),
          array_join(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)), "|").as("nums"))
        .orderBy("event_id").limit(100)
    },

    "q90_gap_fill" -> { (s, _) =>
      // Date spine × activity: the distinct-user spine is tiny; the
      // activity agg is one hash agg over events; the left join fills
      // silent days with zero.
      val spine = t(s, "events").where(col("user_id") < 5)
        .select(col("user_id")).distinct()
        .select(col("user_id"),
          explode(expr("sequence(date '2024-01-01', date '2024-01-14', interval 1 day)")).as("d"))
      val act = t(s, "events")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).cast("date").as("d"))
        .agg(count(lit(1)).as("c"))
      spine.join(act, Seq("user_id", "d"), "left")
        .select(col("user_id"), col("d").cast("timestamp").as("dday"),
          coalesce(col("c"), lit(0L)).as("c"))
        .orderBy("user_id", "dday")
    },

    "q92_span_dedup" -> { (s, _) =>
      // C4-style span-level exact dedup: the operator's agg/join shape is
      // DedupOps.spanDedup. The declared SQL contract writes the keeper as
      // doc_id·1000 + span_no; the library operator keeps a
      // min(struct(doc_id, span_no)) instead — identical order while
      // span_no < 1000 (base-1000 encoding IS lexicographic there), which
      // the fixture satisfies, and uncapped beyond it.
      DedupOps.spanDedup(t(s, "documents"), col("doc_id"), col("text"), 20)
        .orderBy("doc_id", "span_no").limit(500)
    },

    "q93_regr_stats" -> { (s, _) =>
      // Regression moments are one-pass mergeable aggregates (map-side
      // combined); ratios rounded before the hash per H10.
      val y = col("l_extendedprice").cast("double")
      val x = col("l_quantity").cast("double")
      t(s, "lineitem").groupBy("l_returnflag")
        .agg(round(regr_slope(y, x), 4).as("slope"),
          round(regr_intercept(y, x), 4).as("icept"),
          round(regr_r2(y, x), 6).as("r2"),
          regr_count(y, x).as("n"))
        .orderBy("l_returnflag")
    },

    "q94_gopher_filter" -> { (s, _) =>
      // Gopher repetition/quality composite: top-word fraction via two hash
      // aggs over one explode; per-doc scalars (mean word length) computed
      // in the projection and joined back on doc_id.
      val docs = t(s, "documents")
      val counts = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      val top = counts.groupBy("doc_id")
        .agg(max("c").as("top_c"), sum("c").as("n_tok"))
      val m = docs.select(col("doc_id"),
        round(length(regexp_replace(col("text"), " ", "")).cast("double") /
          size(split(col("text"), " ")), 4).as("awl"))
      val topFrac = col("top_c").cast("double") / col("n_tok")
      m.join(top, "doc_id")
        .select(col("doc_id"), col("n_tok").cast("long").as("n_tok"),
          round(topFrac, 4).as("top_frac"), col("awl"),
          when(col("n_tok").between(50, 100000) && col("awl").between(3, 10)
              && topFrac <= 0.2, "keep").otherwise("drop").as("verdict"))
        .orderBy("doc_id").limit(300)
    },

    "q98_bitagg" -> { (s, _) =>
      // One-pass mergeable bit-mask aggregates (map-side combined like any
      // hash agg) — the flag-rollup family.
      t(s, "lineitem").groupBy("l_returnflag")
        .agg(bit_and(col("l_linenumber")).as("ba"),
          bit_or(col("l_linenumber")).as("bo"),
          bit_xor(col("l_linenumber")).as("bx"),
          bit_and(col("l_partkey")).as("bp"),
          bit_or(col("l_suppkey")).as("bs"))
        .orderBy("l_returnflag")
    },

    "q99_map_ops" -> { (s, _) =>
      // Map build + lookup + canonical serialization: entries SORTED at
      // construction and again at render, so the map column is engine-
      // deterministic; output is scalar columns only (H2). Two hash aggs
      // (status counts, map assembly) — same shuffle shape as any
      // two-level rollup. try_element_at, not element_at: ANSI mode throws
      // on absent keys (hazard H16).
      val counts = t(s, "orders")
        .groupBy(col("o_custkey"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy("o_custkey")
        .agg(map_from_entries(array_sort(
          collect_list(struct(col("st"), col("cnt"))))).as("mp"))
        .select(col("o_custkey"),
          coalesce(try_element_at(col("mp"), lit("O")), lit(0L)).as("open_cnt"),
          size(col("mp")).cast("long").as("n_statuses"),
          array_join(transform(array_sort(map_entries(col("mp"))),
            e => concat(e.getField("key"), lit(":"),
              e.getField("value").cast("string"))), ",").as("entries"))
        .orderBy("o_custkey").limit(300)
    },

    "q107_within_group" -> { (s, _) =>
      // ANSI WITHIN GROUP ordered-set aggregate — SQL-only syntax, so the
      // DF impl goes through expr(); one hash agg per group either way.
      t(s, "orders").groupBy("o_orderpriority")
        .agg(
          round(expr("percentile_cont(0.5) within group (order by cast(o_totalprice as double))"), 4).as("p50"),
          round(expr("percentile_cont(0.9) within group (order by cast(o_totalprice as double))"), 4).as("p90"))
        .orderBy("o_orderpriority")
    },

    "q109_array_membership" -> { (s, _) =>
      // Membership predicates are narrow per-row HOFs; the only shuffle
      // is the doc_id+100 equi self-join. 0-for-absent position, widths
      // normalized to bigint (see the corpus note).
      val tok = t(s, "documents").where(col("doc_id") < 200)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      tok.as("a").join(tok.as("b"), col("b.doc_id") === col("a.doc_id") + 100)
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
          arrays_overlap(col("a.w"), col("b.w")).as("has_common"),
          array_position(col("a.w"), lit("the")).cast("long").as("the_pos"),
          size(col("a.w")).cast("long").as("n_a"))
        .orderBy("i")
    },

    "q110_time_range_frames" -> { (s, _) =>
      // Interval RANGE frames are SQL-only syntax (the Column API's
      // rangeBetween takes longs), so the windows go through expr() —
      // still one Window exec partitioned on user_id, decimal frame sum
      // per the q18 discipline.
      t(s, "events").select(col("event_id"), col("user_id"),
          expr("cast(count(*) over (partition by user_id order by ts range between interval 1 hour preceding and current row) as bigint)").as("c1h"),
          expr("round(cast(sum(cast(value as decimal(18,4))) over (partition by user_id order by ts range between interval 1 hour preceding and current row) as double), 4)").as("s1h"))
        .orderBy("user_id", "event_id").limit(300)
    },

    "q111_string_funcs2" -> { (s, _) =>
      // Pure projections; instr == ANSI position (1-based, 0 absent).
      t(s, "part").select(col("p_partkey"),
          translate(col("p_name"), "aeiou", "12345").as("tr"),
          repeat(col("p_brand"), 2).as("rp"),
          expr("left(p_name, 4)").as("l4"),
          expr("right(p_name, 4)").as("r4"),
          split_part(col("p_name"), lit(" "), lit(2)).as("w2"),
          instr(col("p_name"), "a").cast("long").as("pos_a"))
        .orderBy("p_partkey").limit(300)
    },

    "q112_pos_explode" -> { (s, _) =>
      // posexplode is a narrow generator — no shuffle before the sort;
      // 0-based pos normalized to bigint (DuckDB's subscripts are
      // 1-based, shifted in its dialect text).
      t(s, "documents").where(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("w"))
        .orderBy("doc_id", "pos").limit(500)
    },

    "q113_nullsafe_join" -> { (s, _) =>
      // eqNullSafe (<=>) keeps NULL keys matchable; still a plain hash
      // join on the null-safe key — no special plan shape.
      val part = t(s, "part").select(col("p_partkey"),
        nullif(col("p_size"), lit(5)).as("sz"))
      val a = part.where(col("p_partkey") < 100).as("a")
      val b = part.where(col("p_partkey") >= 100).as("b")
      a.join(b, col("a.sz") <=> col("b.sz"))
        .select(col("a.p_partkey").as("ka"), col("b.p_partkey").as("kb"))
        .orderBy("ka", "kb").limit(300)
    },

    "q114_values_join" -> { (s, _) =>
      // Literal dimension relation — broadcast-joined to the stored table
      // (3 rows; Catalyst folds it to a LocalRelation).
      import s.implicits._
      val vals = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma")).toDF("rk", "tag")
      vals.join(t(s, "region"), col("r_regionkey") === col("rk"))
        .select(col("tag"), col("r_name")).orderBy("tag")
    },

    "q115_calendar_parts" -> { (s, _) =>
      // 0-based DOW canonical form (Sunday=0): Spark's dayofweek is
      // 1-based — see the corpus note on the dialect trap.
      t(s, "orders").select(col("o_orderkey"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          quarter(col("o_orderdate")).cast("long").as("q"))
        .orderBy("o_orderkey").limit(300)
    },

    "q116_format_parse" -> { (s, _) =>
      // Render + parse-back round trip under the JDK pattern dialect.
      t(s, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy/MM/dd").as("txt"))
        .select(col("o_orderkey"), col("txt"),
          to_timestamp(col("txt"), "yyyy/MM/dd").as("back"))
        .orderBy("o_orderkey").limit(300)
    },

    "q117_recursive_cte" -> { (s, _) =>
      // The Column API has no recursion; the DF twin lowers the SAME
      // fixpoint (k = 1..12) to sequence+explode — a LocalRelation after
      // constant folding, so the plan is the join + agg alone. The
      // declared SQL text exercises the real recursive execution.
      val months = s.range(1).select(explode(sequence(lit(1), lit(12))).as("k"))
      months.join(t(s, "orders"), month(col("o_orderdate")) === col("k"))
        .groupBy("k").agg(count(lit(1)).as("c")).orderBy("k")
    },

    "q118_greatest_least" -> { (s, _) =>
      // Pure projections; both engines' greatest/least skip nulls.
      t(s, "part").select(col("p_partkey"),
          greatest(col("p_size"), lit(10)).as("g"),
          least(col("p_size"), lit(10)).as("l"),
          greatest(nullif(col("p_size"), lit(5)), lit(0)).as("gn"),
          least(nullif(col("p_size"), lit(5)), lit(999)).as("ln"))
        .orderBy("p_partkey").limit(300)
    },

    "q119_levenshtein" -> { (s, _) =>
      // Key-shifted equi self-join; the DP runs per matched pair only.
      val part = t(s, "part").select("p_partkey", "p_name")
      part.as("a").join(part.as("b"), col("b.p_partkey") === col("a.p_partkey") + 100)
        .select(col("a.p_partkey").as("ka"), col("b.p_partkey").as("kb"),
          levenshtein(col("a.p_name"), col("b.p_name")).as("d"))
        .orderBy("ka").limit(300)
    },

    "q120_ilike" -> { (s, _) =>
      t(s, "part").where(col("p_name").ilike("%WiDg%"))
        .select("p_partkey", "p_name").orderBy("p_partkey").limit(300)
    },

    "q121_regex_split" -> { (s, _) =>
      // split() is regex-based in Spark; narrow projection, no shuffle
      // before the sort.
      t(s, "documents")
        .select(col("doc_id"), size(split(col("text"), "[ ,.]+")).cast("long").as("n"))
        .orderBy("doc_id").limit(300)
    },

    "q122_hamming" -> { (s, _) =>
      // popcount-of-xor projection — the simhash distance as a scalar.
      t(s, "part").select(col("p_partkey"),
          bit_count(col("p_partkey").bitwiseXOR(col("p_size").cast("long")))
            .cast("long").as("hd"))
        .orderBy("p_partkey").limit(300)
    },

    "q123_suffix_frames" -> { (s, _) =>
      // Reverse-running aggregates: same partitioned Window exec, frame
      // anchored at the partition's end.
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, "orders").select(col("o_orderkey"), col("o_custkey"),
          round(sum(col("o_totalprice").cast("decimal(18,4)"))
            .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
            .cast("double"), 4).as("suffix_sum"),
          count(lit(1))
            .over(w.rowsBetween(1, Window.unboundedFollowing))
            .cast("long").as("n_after"))
        .orderBy("o_custkey", "o_orderkey").limit(300)
    },

    "q124_epoch_seconds" -> { (s, _) =>
      // unix_timestamp floors fractional seconds (the canonical
      // convention — see the corpus note on DuckDB's rounding cast).
      t(s, "events").select(col("event_id"),
          unix_timestamp(col("ts")).cast("long").as("es"))
        .orderBy("event_id").limit(300)
    },

    "q125_window_collect" -> { (s, _) =>
      // Trailing-history collection under a ROWS frame — deterministic
      // by the (ts, event_id) total order, rendered as one string.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
      t(s, "events").select(col("event_id"), col("user_id"),
          array_join(collect_list(col("event_type")).over(w), ",").as("last3"))
        .orderBy("user_id", "event_id").limit(300)
    },

    "q126_distinct_string_agg" -> { (s, _) =>
      // Dedup inside the agg buffer (collect_set), sort + join at the
      // end — one hash agg, map-side combined.
      t(s, "orders").groupBy("o_custkey")
        .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("prios"))
        .orderBy("o_custkey").limit(300)
    },

    "q127_regex_predicate" -> { (s, _) =>
      // Find-anywhere regex predicate — pushed to the scan as a filter.
      t(s, "documents").where(regexp_like(col("text"), lit("qu[a-z]+")))
        .select("doc_id").orderBy("doc_id").limit(300)
    },

    "q128_int_arith" -> { (s, _) =>
      // Truncating integer division (see the corpus convention note).
      t(s, "part").select(col("p_partkey"),
          ((col("p_partkey") - 100) % 7).cast("long").as("md"),
          expr("cast((100 - p_partkey) div 7 as bigint)").as("dv"),
          (round((col("p_size") - 10) / 2.0, 0) + 0).as("rh"))
        .orderBy("p_partkey").limit(300)
    },

    "q129_array_zip" -> { (s, _) =>
      // Positional pairing — per-row HOFs after one equi self-join;
      // null-padding to the longer array is the declared convention.
      val tok = t(s, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      tok.as("a").join(tok.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.doc_id").as("i"),
          array_join(transform(arrays_zip(col("a.w").as("wa"), col("b.w").as("wb")),
            x => concat(coalesce(x.getField("wa"), lit("_")), lit(":"),
              coalesce(x.getField("wb"), lit("_")))), " ").as("pairs"))
        .orderBy("i").limit(200)
    },

    "q130_chr_trim" -> { (s, _) =>
      // ANSI trim forms are SQL-only spellings — expr() for those; the
      // whole row is a pure projection.
      t(s, "part").select(col("p_partkey"),
          ascii(col("p_name")).as("a1"),
          expr("chr(65 + cast(p_partkey % 26 as int))").as("ch"),
          expr("trim(both 'B#' from p_brand)").as("tb"),
          expr("trim(leading 'abc' from p_name)").as("lt"))
        .orderBy("p_partkey").limit(300)
    },

    "q131_lead_lag_default" -> { (s, _) =>
      // Defaults fill the frame edges — same single Window exec as the
      // bare q17 forms, one shuffle on user_id.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, "events").select(col("event_id"), col("user_id"),
          lead(col("event_type"), 2, "END").over(w).as("nx2"),
          lag(col("value"), 3, 0.0).over(w).as("pv3"))
        .orderBy("user_id", "event_id").limit(300)
    },

    "q132_null_ordering" -> { (s, _) =>
      // Explicit NULLS FIRST (hazard H19: the engines' defaults differ)
      // — observable through the LIMIT cut, not just render order.
      t(s, "part").select(col("p_partkey"), nullif(col("p_size"), lit(25)).as("k"))
        .orderBy(col("k").asc_nulls_first, col("p_partkey")).limit(300)
    },

    "q133_not_in_null" -> { (s, _) =>
      // The NULL-in-list forms are SQL spellings (isin has no null
      // overload) — expr() keeps the declared three-valued semantics.
      t(s, "part").select(col("p_partkey"),
          expr("p_size not in (5, 10, null)").as("raw"),
          coalesce(expr("p_size not in (5, 10, null)"), lit(true)).as("safe"),
          (!col("p_size").isin(5, 10)).as("plain"))
        .orderBy("p_partkey").limit(300)
    },

    "q134_hash_funcs" -> { (s, _) =>
      // Pure codegen projection; md5 is the corpus' portable primitive.
      t(s, "part").select(col("p_partkey"),
          md5(col("p_name")).as("h1"),
          sha2(col("p_name"), 256).as("h2"),
          length(md5(col("p_brand"))).cast("long").as("hl"))
        .orderBy("p_partkey").limit(300)
    },

    "q135_sequence_slice" -> { (s, _) =>
      // Bounded per-row generation (1..6 elements) — no explode, the
      // arrays never leave the projection.
      val seqCol = sequence(lit(1), col("p_size") % 6 + 1)
      t(s, "part").select(col("p_partkey"),
          array_join(transform(seqCol, x => x.cast("string")), ",").as("seq"),
          array_join(transform(slice(seqCol, 2, 3), x => x.cast("string")), ",").as("sl"))
        .orderBy("p_partkey").limit(300)
    },

    "q136_bit_shifts" -> { (s, _) =>
      // Scalar bit family (shiftleft/shiftright are the Column names of
      // the declared << / >> operators).
      t(s, "part").select(col("p_partkey"),
          shiftleft(col("p_partkey"), 3).cast("long").as("shl"),
          shiftright(col("p_partkey"), 2).cast("long").as("shr"),
          col("p_partkey").bitwiseAND(255).cast("long").as("mask"),
          col("p_partkey").bitwiseOR(4096).cast("long").as("orr"),
          col("p_partkey").bitwiseXOR(col("p_size").cast("long")).cast("long").as("xr"))
        .orderBy("p_partkey").limit(300)
    },

    "q137_month_clamp" -> { (s, _) =>
      // add_months clamps to month end in both engines (corpus note).
      // Timestamp render per the house rule — raw DATE columns render
      // differently across the compare paths (q73 note).
      t(s, "orders").select(col("o_orderkey"),
          add_months(col("o_orderdate"), 1).cast("timestamp").as("m1"),
          add_months(col("o_orderdate"), -3).cast("timestamp").as("m3"),
          last_day(col("o_orderdate")).cast("timestamp").as("ld"))
        .orderBy("o_orderkey").limit(300)
    },

    "q138_pad_substr" -> { (s, _) =>
      // Pad/truncate-to-n plus the negative-start convention (counts
      // from the end, clamps at the front) — pure projection.
      t(s, "part").select(col("p_partkey"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("pk8"),
          rpad(col("p_brand"), 10, ".").as("br"),
          substring(col("p_name"), -6, 4).as("tail4"),
          expr("substring(p_name, -6)").as("tail"))
        .orderBy("p_partkey").limit(300)
    },

    "q139_empty_agg" -> { (s, _) =>
      // Grouping-less agg over zero rows: one row, count 0, NULL
      // extremes — the filter prunes at the scan.
      t(s, "lineitem").where(col("l_quantity") > 1000000)
        .agg(count(lit(1)).cast("long").as("c"),
          sum(col("l_quantity")).as("s"),
          min(col("l_shipdate")).as("m"),
          avg(col("l_extendedprice")).as("a"))
    },

    "q140_typed_json" -> { (s, _) =>
      // ONE typed from_json parse against an explicit DDL schema serves
      // every extraction — nested path, array index, absent field (typed
      // null) — where the q28 idiom costs one get_json_object walk per
      // field. At 100 TB this is the difference between parsing a
      // payload once and parsing it per column; pure projection, codegen,
      // no shuffle.
      val js = concat(lit("{\"id\":"), col("user_id").cast("string"),
        lit(",\"tags\":[\""), col("event_type"), lit("\",\"x\"],\"meta\":{\"d\":"),
        (col("event_id") % 7).cast("string"), lit("}}"))
      t(s, "events")
        .select(col("event_id"), col("props"),
          from_json(js, org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT, tags ARRAY<STRING>, meta STRUCT<d: BIGINT>, nope STRING")).as("s"))
        .select(col("event_id"), col("s.id").as("jid"),
          element_at(col("s.tags"), 1).as("t0"),
          size(col("s.tags")).cast("long").as("nt"),
          col("s.meta.d").as("md"), col("s.nope").as("missing"),
          get_json_object(col("props"), "$.k").cast("int").as("pk"))
        .orderBy("event_id").limit(300)
    },

    "q141_explode_outer" -> { (s, _) =>
      // posexplode_outer KEEPS the parent row with a (NULL, NULL) child on
      // an empty array — inner explode silently drops it (H8 sibling).
      // Explicit NULLS FIRST: the nullable pos under a LIMIT is H19.
      t(s, "part")
        .select(col("p_partkey"),
          filter(split(col("p_name"), " "), x => length(x) > 5).as("ws"))
        .select(col("p_partkey"), posexplode_outer(col("ws")))
        .select(col("p_partkey"), col("pos").cast("long").as("pos"), col("col").as("w"))
        .orderBy(col("p_partkey"), col("pos").asc_nulls_first)
        .limit(300)
    },

    "q142_mode_countif" -> { (s, _) =>
      // mode is declared only where the max count is unique (corpus note);
      // count_if is q49's FILTER counting under its shared name.
      t(s, "orders").agg(
        mode(col("o_orderpriority")).as("m"),
        count_if(col("o_totalprice") > 150000).cast("long").as("big"),
        (count(lit(1)) - count_if(col("o_totalprice") > 150000)).cast("long").as("rest"))
    },

    "q143_nth_value" -> { (s, _) =>
      // Explicit full frame: nth_value reads from the FRAME and the
      // default RANGE..CURRENT ROW would NULL rows before the n-th.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, "orders").select(col("o_orderkey"), col("o_custkey"),
          nth_value(col("o_totalprice"), 3).over(w).as("third"),
          nth_value(col("o_orderkey"), 1).over(w).as("firstk"))
        .orderBy("o_orderkey").limit(300)
    },

    "q144_group_by_all" -> { (s, _) =>
      // The DF API has no GROUP BY ALL to infer — the twin groups
      // explicitly, which is exactly what the inference resolves to.
      t(s, "orders").groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).cast("long").as("c"),
          round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 4).as("s"))
        .orderBy("o_orderstatus", "o_orderpriority")
    },

    "q145_inline_structs" -> { (s, _) =>
      // inline() explodes the struct array and the select flattens the
      // fields — structs never reach the output (H16 render discipline).
      t(s, "part")
        .select(col("p_partkey"),
          arrays_zip(split(col("p_name"), " "), array(lit(1), lit(2), lit(3))).as("zs"))
        .select(col("p_partkey"), inline(col("zs")))
        .toDF("p_partkey", "a", "b")
        .select(col("p_partkey"), col("a"), col("b").cast("long").as("b"))
        // b is non-null with this fixture (zip list covers every name
        // length), but the H19 qualifier is spelled anyway: were a name
        // ever longer than the literal array, the padded-b placement
        // would otherwise silently diverge under the LIMIT.
        .orderBy(col("p_partkey"), col("b").asc_nulls_first).limit(300)
    },

    "q146_calendar_distance" -> { (s, _) =>
      // Boundary-convention month/year distances via explicit extraction
      // arithmetic — the builtins disagree (corpus note), the arithmetic
      // cannot.
      val base = t(s, "orders").select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        date_add(col("o_orderdate").cast("date"), 45).as("df"),
        date_add(col("o_orderdate").cast("date"), -100).as("db"))
      base.select(col("o_orderkey"),
          ((year(col("df")) - year(col("o_orderdate"))) * 12 +
            (month(col("df")) - month(col("o_orderdate")))).cast("long").as("bm_fwd"),
          (year(col("df")) - year(col("o_orderdate"))).cast("long").as("by_fwd"),
          ((year(col("o_orderdate")) - year(col("db"))) * 12 +
            (month(col("o_orderdate")) - month(col("db")))).cast("long").as("bm_back"))
        .orderBy("o_orderkey").limit(300)
    },

    "q147_percentile_disc" -> { (s, _) =>
      // WITHIN GROUP is SQL-only syntax — expr() like q107; disc picks an
      // actual element where cont interpolates.
      t(s, "orders").groupBy("o_orderstatus")
        .agg(
          round(expr("percentile_disc(0.25) within group (order by o_totalprice)").cast("double"), 2).as("p25"),
          round(expr("percentile_disc(0.5) within group (order by o_totalprice)").cast("double"), 2).as("p50"),
          round(expr("percentile_disc(0.9) within group (order by o_totalprice)").cast("double"), 2).as("p90"))
        .orderBy("o_orderstatus")
    },

    "q148_concat_null" -> { (s, _) =>
      // concat() null-poisons in Spark (so it IS the || twin here) but
      // skips nulls in DuckDB — the corpus declares only the two
      // spellings whose conventions agree (corpus note).
      t(s, "part").select(col("p_partkey"),
          concat(col("p_name"), lit("-"), nullif(col("p_type"), lit("PROMO"))).as("pipe"),
          concat_ws("/", col("p_name"), nullif(col("p_type"), lit("PROMO")), col("p_type")).as("ws"))
        .orderBy("p_partkey").limit(300)
    },

    "q149_like_escape_element" -> { (s, _) =>
      // ANSI LIKE ... ESCAPE has no Column-API form — expr() carries the
      // clause; try_element_at is the ANSI-safe access (bare element_at
      // throws out-of-bounds under ANSI).
      t(s, "part").select(col("p_partkey"),
          expr("concat_ws('%', p_name, p_type) like '%!%PROMO' escape '!'").as("m"),
          try_element_at(split(col("p_name"), " "), lit(-1)).as("lastw"),
          try_element_at(split(col("p_name"), " "), lit(5)).as("oob"))
        .orderBy("p_partkey").limit(300)
    },

    "q150_array_quantifiers" -> { (s, _) =>
      // Native ∃/∀ HOFs — pure projection, no shuffle; the curation
      // gate shape (any flagged token / all tokens valid) with both
      // branches live in the window, plus the empty-array conventions
      // over a slice-built [] (corpus note).
      val ws = split(col("text"), " ")
      val empty = slice(ws, 2, 0)
      t(s, "documents").select(col("doc_id"),
          exists(ws, w => length(w) > 7).as("has_long"),
          forall(ws, w => length(w) > 2).as("all_gt2"),
          exists(empty, w => length(w) > 0).as("ex_empty"),
          forall(empty, w => length(w) > 0).as("fa_empty"))
        .orderBy("doc_id").limit(300)
    },

    "q151_to_json_render" -> { (s, _) =>
      // Struct → canonical JSON text (q140's inverse): pure projection,
      // codegen'd JacksonGenerator — no shuffle. ignoreNullFields=false
      // declared so the null convention matches the oracle ("opt":null);
      // ints only inside the document (corpus note). `rt` proves the
      // render → parse round trip inside one engine.
      val opt = when(col("event_id") % 5 === 0, lit(null).cast("long"))
        .otherwise(col("event_id"))
      val esc = concat(col("event_type"), lit("\""), lit("\\"))
      t(s, "events").select(col("event_id"),
          to_json(struct(
            col("user_id").as("id"),
            array(col("event_type"), lit("x")).as("tags"),
            struct((col("event_id") % 7).as("d")).as("meta"),
            opt.as("opt"),
            esc.as("esc")),
            Map("ignoreNullFields" -> "false")).as("js"),
          get_json_object(
            to_json(struct(col("user_id").as("id"),
              array(col("event_type")).as("tags"))),
            "$.tags[0]").as("rt"))
        .orderBy("event_id").limit(300)
    },

    "q152_binary_text" -> { (s, _) =>
      // Binary↔text transport: all codegen'd unary expressions — pure
      // projection, no shuffle. The round trips (hex∘unbase64∘base64,
      // decode∘unhex∘hex∘encode) pin losslessness, not just rendering.
      val dig = unhex(md5(col("p_name")))
      val enc = encode(col("p_brand"), "utf-8")
      t(s, "part").select(col("p_partkey"),
          base64(dig).as("b64"),
          hex(unbase64(base64(dig))).as("rt"),
          hex(enc).as("henc"),
          decode(unhex(hex(enc)), "utf-8").as("dtxt"))
        .orderBy("p_partkey").limit(300)
    },

    "q153_width_bucket" -> { (s, _) =>
      // Equal-width histogram binning with declared under/overflow
      // buckets (0 and n+1): one hash agg on the bucket id — the
      // distribution-report shape, partial+final combined.
      val b = width_bucket(col("o_totalprice").cast("double"),
        lit(100000), lit(420000), lit(10)).as("bucket")
      t(s, "orders").groupBy(b)
        .agg(count(lit(1)).as("c"),
          round(min(col("o_totalprice")).cast("double"), 2).as("mn"),
          round(max(col("o_totalprice")).cast("double"), 2).as("mx"))
        .orderBy("bucket")
    },

    "q154_array_surgery" -> { (s, _) =>
      // Token-list editing HOFs — pure projection. The corpus note
      // carries the declared convention splits (absent position 0 vs
      // NULL, empty-array render '' vs NULL).
      val ws = split(col("p_name"), " ")
      t(s, "part").select(col("p_partkey"),
          array_position(ws, "red").cast("long").as("pos_red"),
          array_join(array_remove(ws, "red"), ",").as("no_red"),
          coalesce(array_join(array_compact(
            transform(ws, w => when(length(w) > 5, w))), ","), lit(""))
            .as("longs"),
          array_join(array_repeat(element_at(ws, 1), 3), ",").as("rep3"))
        .orderBy("p_partkey").limit(300)
    },

    "q155_rounding_log" -> { (s, _) =>
      // Explicit-name logarithms (bare log() is the Spark-ln vs
      // DuckDB-log10 trap) and the two rounding conventions: round =
      // half-up in both engines, bround ≡ round_even = banker's. Pure
      // projection, codegen'd.
      val qty = col("l_quantity")
      t(s, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          round(qty + 0.5).cast("double").as("r_half"),
          bround(qty + 0.5).cast("double").as("r_even"),
          round(log(col("l_extendedprice")), 6).as("lnv"),
          round(log10(col("l_extendedprice")), 6).as("l10"),
          round(log2(qty + 1), 6).as("l2"),
          round(log(3.0, qty + 1), 6).as("lb"))
        .orderBy("l_orderkey", "l_linenumber").limit(300)
    },

    "q156_string_predicates" -> { (s, _) =>
      // The named curation-filter trio (q02 declares the LIKE twins) —
      // pure codegen'd projection.
      t(s, "part").select(col("p_partkey"),
          col("p_name").contains("red").as("has_red"),
          col("p_name").startsWith("small").as("sw"),
          col("p_name").endsWith("bolt").as("ew"))
        .orderBy("p_partkey").limit(300)
    },

    "q157_ngram_lm" -> { (s, _) =>
      // Declared twin of TextOps.ngramModel/ngramScore: train on real
      // docs, score real + md5-gibberish twins interleaved by pid
      // parity. Model vocabulary is bounded (charset³), so it rides a
      // broadcast join; the corpus never shuffles whole.
      val docs = t(s, "documents")
      val sub = docs.where(col("doc_id") < 500)
      val probe = sub.select((col("doc_id") * 2).as("pid"), col("text").as("txt"))
        .unionByName(sub.select((col("doc_id") * 2 + 1).as("pid"),
          concat(md5(col("text")), lit(" "), md5(reverse(col("text")))).as("txt")))
      val dg = probe.select(col("pid"),
          explode(graft.ops.TextOps.charShingles(col("txt"), 3)).as("gram"))
        .where(length(col("gram")) === 3)
      // Model trains on the WHOLE corpus; only the scored probe is capped.
      val m0 = docs.select(explode(
            graft.ops.TextOps.charShingles(col("text"), 3)).as("gram"))
        .where(length(col("gram")) === 3)
        .groupBy("gram").agg(count(lit(1)).as("c")).where(col("c") >= 2)
      val total = m0.agg(sum(col("c")).as("total"))
      val m = m0.crossJoin(broadcast(total))
        .select(col("gram"), log(col("c") / col("total")).as("logp"))
      dg.join(broadcast(m), Seq("gram"), "left")
        .crossJoin(broadcast(total))
        .groupBy("pid")
        .agg(count(lit(1)).cast("long").as("n_grams"),
          round(avg(coalesce(col("logp"), log(lit(0.5) / col("total")))), 4).as("score"),
          round(sum(when(col("logp").isNull, 1L).otherwise(0L)) /
            count(lit(1)).cast("double"), 4).as("oov"))
        .orderBy("pid").limit(300)
    },

    "q158_dow_conventions" -> { (s, _) =>
      // Sunday-first dayofweek (the shared-name trap vs DuckDB's
      // 0-based dow), ISO day number via weekday()+1, ISO doy/week —
      // pure projection.
      t(s, "orders").select(col("o_orderkey"),
          dayofweek(col("o_orderdate")).cast("long").as("dw"),
          (weekday(col("o_orderdate")) + 1).cast("long").as("iso"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          weekofyear(col("o_orderdate")).cast("long").as("wk"))
        .orderBy("o_orderkey").limit(300)
    },

    "q159_div_zero" -> { (s, _) =>
      // try_divide/try_mod: the ANSI-safe spellings (bare /0 throws
      // under Spark's ANSI default); NULL rows live in the window.
      val den3 = col("o_orderkey") % 3
      t(s, "orders").select(col("o_orderkey"),
          round(try_divide(col("o_totalprice"), den3), 4).as("safe_div"),
          try_mod(col("o_orderkey"), col("o_orderkey") % 5).as("safe_mod"),
          round(col("o_totalprice") / nullif(den3, lit(0)), 4).as("portable_div"))
        .orderBy("o_orderkey").limit(300)
    },

    "q160_mix_sources" -> { (s, _) =>
      // The Pipelines.mixSources op under its declared mixture spec —
      // the DF impl verifies the threshold encoding (rate → hex) and
      // seeded-hash acceptance cross-engine. One narrow filter.
      graft.api.Pipelines.mixSources(
          t(s, "documents").select("source", "doc_id"), "source", "doc_id",
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.05))
        .orderBy("source", "doc_id")
    },

    "q161_pii_redaction" -> { (s, _) =>
      // TextOps.redactPii under its declared augmentation: every row
      // carries deterministic doc_id-derived PII of each class, counts
      // per class, then the chained canonical-order redaction.
      val aug = concat(col("text"), lit(" contact u"), col("doc_id").cast("string"),
        lit("@mail.example.org or +1-555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-"), lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        lit(" at 192.168."), (col("doc_id") % 256).cast("string"),
        lit("."), ((col("doc_id") * 3) % 256).cast("string"))
      val pat = graft.ops.TextOps.piiPatterns.map(p => p._1 -> p._2).toMap
      t(s, "documents")
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          regexp_count(col("aug"), lit(pat("email"))).as("n_email"),
          regexp_count(col("aug"), lit(pat("ipv4"))).as("n_ip"),
          regexp_count(col("aug"), lit(pat("phone"))).as("n_phone"),
          graft.ops.TextOps.redactPii(col("aug")).as("redacted"))
        .orderBy("doc_id").limit(200)
    },

    "q162_boundary_span_dedup" -> { (s, _) =>
      // The library operator under the declared boundary spec (' the '
      // separator, 10-char floor). Struct-min keeper ≡ the SQL's numeric
      // encoding while span_no < 1000 (fixture max: 7).
      graft.ops.DedupOps.boundarySpanDedup(
          t(s, "documents"), col("doc_id"), col("text"),
          separator = " the ", minChars = 10)
        .orderBy("doc_id", "span_no").limit(500)
    },

    "q163_sequence_packing" -> { (s, _) =>
      // Pipelines.packSequences under the declared spec (per-source
      // streams, doc_id order, budget 256).
      graft.api.Pipelines.packSequences(
          t(s, "documents").select("doc_id", "source", "text"),
          "source", "doc_id", size(split(col("text"), " ")).cast("bigint"), 256)
        .select("doc_id", "source", "n_tok", "pack_id", "pack_off", "crosses")
        .orderBy("source", "doc_id").limit(300)
    },

    "q164_url_parse" -> { (s, _) =>
      // parse_url conventions (java.net semantics) + the shared apex-
      // domain regexp — the per-domain curation key. Pure projection.
      val url = concat(
        when(col("doc_id") % 2 === 0, "https").otherwise("http"),
        lit("://sub"), (col("doc_id") % 5).cast("string"),
        lit(".example"), (col("doc_id") % 3).cast("string"),
        lit(".org/p/"), col("doc_id").cast("string"),
        lit("/doc?q="), (col("doc_id") % 7).cast("string"), lit("&lang=en"))
      def part(p: String) = call_function("parse_url", col("url"), lit(p))
      t(s, "documents").select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), col("url"),
          part("PROTOCOL").as("proto"), part("HOST").as("host"),
          part("PATH").as("path"), part("QUERY").as("qs"),
          regexp_extract(part("HOST"), "([^.]+\\.[^.]+)$", 1).as("apex"))
        .orderBy("doc_id").limit(300)
    },

    "q165_string_indexing" -> { (s, _) =>
      // The measured conventions of the string-indexing family; pure
      // projection (see Corpus for the locate/strpos and negative
      // left/right dialect splits).
      val p = col("p_name")
      t(s, "part").select(col("p_partkey"),
          split_part(p, lit(" "), lit(2)).as("sp2"),
          split_part(p, lit(" "), lit(-1)).as("spneg"),
          split_part(p, lit(" "), lit(50)).as("spoor"),
          locate("o", p).cast("bigint").as("pos"),
          instr(p, "al").cast("bigint").as("ins"),
          locate("zz", p).cast("bigint").as("loc"),
          call_function("left", p, lit(4)).as("l4"),
          call_function("right", p, lit(4)).as("r4"),
          call_function("left", p, length(p) - 4).as("butlast"),
          translate(p, "aeiou", "01234").as("trans"))
        .orderBy("p_partkey").limit(300)
    },

    "q166_split_weighted" -> { (s, _) =>
      // Pipelines.splitWeighted under the declared 0.8/0.1/0.1 spec.
      t(s, "documents").select(col("doc_id"),
          graft.api.Pipelines.splitWeighted("doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
        .orderBy("doc_id").limit(500)
    },

    "q167_bm25" -> { (s, _) =>
      // Pipelines.bm25Rank under the declared term set / constants.
      graft.api.Pipelines.bm25Rank(
          t(s, "documents"), col("doc_id"), col("text"),
          Seq("data", "stream", "sort"))
        .select(col("doc_id"), round(col("score"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(100)
    },

    "q168_url_malformed" -> { (s, _) =>
      // try_parse_url's row-degrade convention on dirty crawl URLs.
      val url = when(col("doc_id") % 3 === 0,
          concat(lit("https://h"), (col("doc_id") % 7).cast("string"),
            lit(".example.org/p/"), col("doc_id").cast("string")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("not a url "), col("doc_id").cast("string")))
        .otherwise(concat(lit("://missing-scheme/"), col("doc_id").cast("string")))
      val host = call_function("try_parse_url", col("url"), lit("HOST"))
      t(s, "documents").select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), col("url"), host.as("host"),
          coalesce(host, lit("<unparseable>")).as("host_or"))
        .orderBy("doc_id").limit(300)
    },

    "q169_pagerank" -> { (s, _) =>
      // GraphOps.pageRank (exact integer micro-ranks) over the symmetric
      // part↔supplier graph at the declared depth/damping.
      val li = t(s, "lineitem")
      val edges = li.select(
          concat(lit("p"), col("l_partkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .unionAll(li.select(
          concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
          concat(lit("p"), col("l_partkey").cast("string")).as("dst")))
      graft.ops.GraphOps.pageRank(edges, iterations = 3)
        .select("node", "r")
        .orderBy(col("r").desc, col("node")).limit(100)
    },

    "q170_ppr" -> { (s, _) =>
      // GraphOps.personalizedPageRank seeded on the supplier side of the
      // same symmetric graph — teleport mass lands on seeds only.
      val li = t(s, "lineitem")
      val edges = li.select(
          concat(lit("p"), col("l_partkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .unionAll(li.select(
          concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
          concat(lit("p"), col("l_partkey").cast("string")).as("dst")))
      val seeds = li.select(
        concat(lit("s"), col("l_suppkey").cast("string")).as("node")).distinct()
      graft.ops.GraphOps.personalizedPageRank(edges, seeds, iterations = 3)
        .select("node", "r")
        .orderBy(col("r").desc, col("node")).limit(100)
    },

    "q171_label_prop" -> { (s, _) =>
      // GraphOps.labelPropagation (deterministic min-tie-break LPA) over
      // the same symmetric part↔supplier graph, 2 synchronous rounds.
      val li = t(s, "lineitem")
      val edges = li.select(
          concat(lit("p"), col("l_partkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .unionAll(li.select(
          concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
          concat(lit("p"), col("l_partkey").cast("string")).as("dst")))
      graft.ops.GraphOps.labelPropagation(edges, iterations = 2)
        .orderBy("node").limit(300)
    },

    "q172_triangles" -> { (s, _) =>
      // GraphOps.triangleCount (degree-ordered wedge orientation) over
      // the triangle-seeded part↔supplier↔orderbucket graph — the
      // q172Sql oracle closes id-ordered wedges; counts agree exactly.
      val li = t(s, "lineitem").where(col("l_orderkey") % 20 === 0)
      val p = concat(lit("p"), col("l_partkey").cast("string"))
      val sup = concat(lit("s"), col("l_suppkey").cast("string"))
      val k = concat(lit("k"), (col("l_orderkey") % 97).cast("string"))
      val edges = li.select(p.as("src"), sup.as("dst"))
        .unionAll(li.select(sup.as("src"), k.as("dst")))
        .unionAll(li.select(k.as("src"), p.as("dst")))
      graft.ops.GraphOps.triangleCount(edges)
        .orderBy("node").limit(300)
    },

    "q173_clustering" -> { (s, _) =>
      // GraphOps.clusteringCoefficient over the q172 graph — triangle
      // counts normalized by 2/(d(d−1)) on the 4dp grid.
      val li = t(s, "lineitem").where(col("l_orderkey") % 20 === 0)
      val p = concat(lit("p"), col("l_partkey").cast("string"))
      val sup = concat(lit("s"), col("l_suppkey").cast("string"))
      val k = concat(lit("k"), (col("l_orderkey") % 97).cast("string"))
      val edges = li.select(p.as("src"), sup.as("dst"))
        .unionAll(li.select(sup.as("src"), k.as("dst")))
        .unionAll(li.select(k.as("src"), p.as("dst")))
      graft.ops.GraphOps.clusteringCoefficient(edges)
        .orderBy("node").limit(300)
    },

    "q174_charset_conventions" -> { (s, _) =>
      // Charset/encoding conventions (pairs with the WARC charset
      // sniffing): latin-1 + UTF-16BE byte layouts, lossless latin-1
      // round trip, U+FFFD invalid-byte replacement — all codegen'd
      // unary expressions, pure projection, no shuffle.
      val nonAscii = concat(col("p_name"), lit(" é±"))
      val brandBytes = encode(col("p_brand"), "utf-8")
      t(s, "part").select(col("p_partkey"),
          hex(encode(nonAscii, "ISO-8859-1")).as("lat1"),
          hex(encode(col("p_brand"), "UTF-16BE")).as("u16"),
          decode(encode(nonAscii, "ISO-8859-1"), "ISO-8859-1").as("rt"),
          call_function("make_valid_utf8",
            concat(brandBytes, unhex(lit("80")), encode(lit("!"), "utf-8"))
              .cast("string")).as("fixed"),
          call_function("is_valid_utf8", col("p_name")).as("ok_ascii"),
          call_function("is_valid_utf8",
            concat(brandBytes, unhex(lit("FF"))).cast("string")).as("ok_broken"))
        .orderBy("p_partkey").limit(300)
    },

    "q175_ordering_conventions" -> { (s, _) =>
      // Complex-typed sort keys: array (lexicographic, shorter-prefix
      // first, empty least) and struct (field-wise) comparators as
      // window ORDER BY. Ranks are PARTITIONED by p_brand — an
      // un-partitioned window funnels every row through one task (the
      // PlanSpec corpus-sweep rule, which caught this query's first
      // draft).
      import org.apache.spark.sql.expressions.Window
      val arr = slice(
        array(col("p_size") % 5, col("p_partkey") % 7, length(col("p_name")) % 6),
        lit(1), (col("p_partkey") % 4).cast("int"))
      val st = struct(col("p_type"), (col("p_size") % 3).as("s3"))
      t(s, "part")
        .select(col("p_partkey"), col("p_brand"), arr.as("arr"), st.as("st"))
        .withColumn("rn_arr", row_number().over(
          Window.partitionBy(col("p_brand")).orderBy(col("arr"), col("p_partkey"))))
        .withColumn("rn_st", row_number().over(
          Window.partitionBy(col("p_brand")).orderBy(col("st"), col("p_partkey"))))
        .select(col("p_partkey"), col("rn_arr"), col("rn_st"),
          array_join(transform(col("arr"), x => x.cast("string")), ",").as("arr_s"))
        .orderBy("p_partkey").limit(300)
    },

    "q176_interval_arithmetic" -> { (s, _) =>
      // Interval spellings over agreeing semantics (duration arithmetic,
      // month clamp, months-before-days in combined intervals) — pure
      // codegen'd projection, no shuffle.
      t(s, "orders").select(col("o_orderkey"),
          expr("o_orderdate + make_interval(0, 0, 0, cast(o_orderkey % 40 as int), " +
            "cast(o_orderkey % 23 as int), cast(o_orderkey % 59 as int), 0)").as("plus_dhm"),
          expr("o_orderdate + make_interval(0, cast(o_orderkey % 14 as int))").as("plus_m"),
          expr("o_orderdate - make_interval(0, 0, 0, cast(o_orderkey % 11 as int))").as("minus_d"),
          expr("o_orderdate + make_interval(0, 1, 0, 3)").as("plus_m_d"))
        .orderBy("o_orderkey").limit(300)
    },

    "q177_date_sequences" -> { (s, _) =>
      // Date/timestamp series conventions (H23): day-stepped (unit and
      // stride), descending, and weekly-timestamp sequences agree
      // engine-for-engine (inclusive stop, last step <= stop); a
      // month-STEPPED sequence does NOT (Spark steps cumulatively from
      // the start, DuckDB re-adds iteratively — they part at the first
      // month-end clamp), so the portable monthly spine is an INDEX
      // series + add-k-months, pinned here. Pure projection, no shuffle.
      t(s, "orders").select(col("o_orderkey"),
          expr("array_join(transform(sequence(cast(o_orderdate as date), " +
            "date_add(cast(o_orderdate as date), cast(o_orderkey % 6 as int)), " +
            "interval 1 day), x -> cast(x as string)), ',')").as("days"),
          expr("array_join(transform(sequence(cast(o_orderdate as date), " +
            "date_add(cast(o_orderdate as date), 5), interval 2 day), " +
            "x -> cast(x as string)), ',')").as("stride"),
          expr("array_join(transform(sequence(cast(o_orderdate as date), " +
            "date_sub(cast(o_orderdate as date), cast(o_orderkey % 4 as int)), " +
            "interval -1 day), x -> cast(x as string)), ',')").as("days_desc"),
          expr("array_join(transform(sequence(0, cast(o_orderkey % 5 as int)), " +
            "k -> cast(add_months(cast(o_orderdate as date), k) as string)), ',')").as("mspine"),
          expr("array_join(transform(sequence(o_orderdate, " +
            "o_orderdate + make_interval(0,0,0,20), interval 7 day), " +
            "x -> cast(x as string)), ',')").as("weekly"))
        .orderBy("o_orderkey").limit(300)
    },

    "q178_url_canonical" -> { (s, _) =>
      // TextOps.canonicalizeUrl over five variants of each logical URL:
      // case/default-port/fragment/tracking variants fold to one form
      // (n_dups = 3 proves the collision), the http and :8443 variants
      // stay distinct. Pure projection + one hash agg + an equi join
      // back (broadcastable group table) — no window, no collect.
      val b = floor(col("doc_id") / 5).cast("long")
      val hn = (b % 13).cast("string")
      val bs = b.cast("string")
      val v = col("doc_id") % 5
      val url = when(v === 0, concat(lit("https://H"), hn,
          lit(".Example.COM:443/Dir/"), bs, lit("?b=2&a=1")))
        .when(v === 1, concat(lit("HTTPS://h"), hn,
          lit(".example.com/Dir/"), bs, lit("?a=1&b=2&utm_campaign=spring#sec2")))
        .when(v === 2, concat(lit("https://h"), hn,
          lit(".EXAMPLE.com/Dir/"), bs, lit("?utm_source=feed&b=2&fbclid=XyZ&a=1")))
        .when(v === 3, concat(lit("http://h"), hn,
          lit(".example.com:80/Dir/"), bs, lit("?a=1&b=2")))
        .otherwise(concat(lit("https://h"), hn,
          lit(".example.com:8443/Dir/"), bs, lit("?a=1&b=2")))
      val c = t(s, "documents").select(col("doc_id"), url.as("url"))
        .withColumn("canon", graft.ops.TextOps.canonicalizeUrl(col("url")))
      val g = c.groupBy("canon").agg(count(lit(1)).as("n_dups"))
      c.join(g, "canon").select("doc_id", "url", "canon", "n_dups")
        .orderBy("doc_id").limit(500)
    },

    "q179_c4_lines" -> { (s, _) =>
      // TextOps.c4LineKeep/c4PageKeep over a synthetic page matrix that
      // exercises every C4 branch (terminal punct, word count, the
      // javascript word vs JavascriptX boundary, trim-before-test,
      // sentence threshold at the exact boundary, '{' and lorem-ipsum
      // page kills). Clean lines join with ' / ' — no newline reaches
      // the hashed cells. Pure per-row projection, no shuffle.
      val raw = concat_ws("\n",
        concat(lit("Welcome to page "), col("doc_id").cast("string"), lit(".")),
        lit("Home | About | Contact"),
        lit("ok."),
        when(col("doc_id") % 3 === 0, "This menu uses javascript to render.")
          .otherwise("JavascriptX is a product name."),
        lit("   Padded and trimmed, fine.   "),
        when(col("doc_id") % 2 === 0, "Is this a question? Yes it is.")
          .otherwise("no terminal punctuation"),
        lit("Final line stands here."),
        when(col("doc_id") % 5 === 0, "Braces {inside} code.")
          .otherwise("Tail sentence number five."),
        when(col("doc_id") % 7 === 0, "Standard Lorem Ipsum placeholder text.")
          .otherwise("One more closing sentence."))
      t(s, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"), raw.as("__raw"))
        .withColumn("__kept",
          filter(transform(split(col("__raw"), "\n"), l => trim(l)),
            l => graft.ops.TextOps.c4LineKeep(l)))
        .withColumn("clean", array_join(col("__kept"), " / "))
        .select(col("doc_id"), size(col("__kept")).as("n_kept"),
          (size(split(col("clean"), "[.!?]")) - 1).as("n_sent"),
          graft.ops.TextOps.c4PageKeep(col("clean"), col("__raw"), 7).as("keep"),
          col("clean"))
        .orderBy("doc_id").limit(300)
    },

    "q180_link_extract" -> { (s, _) =>
      // Href-scraping conventions (the pure-expression subset of
      // Warc.extractHrefs → resolveUrl → linkGraph): both quote styles,
      // &amp; decode BEFORE filtering, http(s)-absolute-only, fragment
      // cut, scheme://host lowered with path/query case kept. Sorted
      // space-joined links — arrays never reach the hashed cells.
      val html = concat(
        lit("<a href=\"https://Site"), (col("doc_id") % 7).cast("string"),
        lit(".ORG/Page?b=2&amp;a=1#s\">x</a>"),
        when(col("doc_id") % 3 === 0,
          concat(lit("<a href='http://alt"), (col("doc_id") % 5).cast("string"),
            lit(".org/P'>y</a>")))
          .otherwise(lit("<a href=\"/relative/skip\">y</a>")),
        lit("<a href=\"mailto:a@b.org\">z</a>"))
      val canonU = (u: Column) => {
        val nf = regexp_replace(u, "#.*", "")
        val head = regexp_extract(nf, "^[^:]*://[^/?]*", 0)
        concat(lower(head), nf.substr(length(head) + 1, length(nf)))
      }
      t(s, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"), html.as("__html"))
        .withColumn("__hrefs", concat(
          regexp_extract_all(col("__html"), lit("href=\"([^\"]*)\""), lit(1)),
          regexp_extract_all(col("__html"), lit("href='([^']*)'"), lit(1))))
        .withColumn("__abs",
          filter(transform(col("__hrefs"), u => regexp_replace(u, "&amp;", "&")),
            u => u.rlike("^(http|https)://")))
        .select(col("doc_id"), size(col("__hrefs")).as("n_href"),
          size(col("__abs")).as("n_abs"),
          array_join(array_sort(transform(col("__abs"), canonU)), " ").as("links"))
        .orderBy("doc_id").limit(300)
    },

    "q181_registered_domain" -> { (s, _) =>
      // TextOps.registeredDomain over a host matrix covering every fold
      // branch: multi-part suffix (3 labels), plain TLD (2), bare
      // suffix / single label (itself), case folding. The declared SQL
      // interpolates the op's own suffix list — the DataFrame impl IS
      // the op, so op ≡ Spark SQL ≡ DuckDB in one gate.
      val m = col("doc_id") % 6
      val host = when(m === 0,
          concat(lit("News.Sub"), col("doc_id").cast("string"), lit(".BBC.co.uk")))
        .when(m === 1, concat(lit("www.shop"), (col("doc_id") % 10).cast("string"),
          lit(".com.au")))
        .when(m === 2, concat(lit("a.b.example"), (col("doc_id") % 10).cast("string"),
          lit(".com")))
        .when(m === 3, concat(lit("example"), (col("doc_id") % 10).cast("string"),
          lit(".org")))
        .when(m === 4, lit("localhost"))
        .otherwise(lit("co.uk"))
      t(s, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"), host.as("host"),
          graft.ops.TextOps.registeredDomain(host).as("apex"))
        .orderBy("doc_id").limit(300)
    },

    "q182_pagerank_weighted" -> { (s, _) =>
      // GraphOps.pageRankWeighted over the symmetric part↔supplier graph
      // with lineitem-row multiplicity as the edge weight — each node's
      // vote splits in proportion to w (see q182Sql for the exact
      // integer micro-rank contract).
      val li = t(s, "lineitem")
      val pw = li.groupBy(
          concat(lit("p"), col("l_partkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .agg(count(lit(1)).as("w"))
      val edges = pw.unionAll(
        pw.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      graft.ops.GraphOps.pageRankWeighted(edges, "w", iterations = 3)
        .select("node", "r")
        .orderBy(col("r").desc, col("node")).limit(100)
    },

    "q183_robots_glob" -> { (s, _) =>
      // The REAL operator (Robots.matches, the iterative greedy-backtrack
      // REP glob) over the q183 pattern/path matrix — the hash gate pins
      // op ≡ the glob-to-LIKE translation in both engines (q181
      // discipline: the impl IS the op). Typed mapPartitions, no UDF.
      import org.apache.spark.sql.types._
      val m6 = col("doc_id") % 6
      val pattern = when(m6 === 0, lit("/p"))
        .when(m6 === 1, lit("/p/*.html$"))
        .when(m6 === 2, lit("/q"))
        .when(m6 === 3, concat(lit("/p/"), (col("doc_id") % 7).cast("string")))
        .when(m6 === 4, lit("*html$"))
        .otherwise(lit("/p/*/"))
      val path = concat(lit("/p/"), (col("doc_id") % 7).cast("string"),
        when(col("doc_id") % 3 === 0, lit(".html"))
          .when(col("doc_id") % 3 === 1, lit(".txt")).otherwise(lit("/")))
      val in = t(s, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"), pattern.as("pattern"), path.as("path"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = true),
        StructField("pattern", StringType, nullable = false),
        StructField("path", StringType, nullable = false),
        StructField("matched", BooleanType, nullable = false)))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
      in.mapPartitions { rows =>
        rows.map { r =>
          org.apache.spark.sql.Row(
            if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)),
            r.getString(1), r.getString(2),
            graft.ops.Robots.matches(r.getString(1), r.getString(2)))
        }
      }(enc).orderBy("doc_id").limit(300)
    },

    "q184_hits" -> { (s, _) =>
      // GraphOps.hitsCounts (exact integer walk counts, 2 iterations)
      // over the DIRECTED part→supplier edge set — see q184Sql for the
      // cross-engine contract.
      val li = t(s, "lineitem")
      val edges = li.select(
        concat(lit("p"), col("l_partkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
      graft.ops.GraphOps.hitsCounts(edges, iterations = 2)
        .select(col("node"), col("hub"), col("auth"))
        .orderBy(col("hub").desc, col("auth").desc, col("node")).limit(100)
    },

    "q185_temperature_mix" -> { (s, _) =>
      // Pipelines.temperatureRates (α = 0.5, the IEEE-exact sqrt
      // spelling) feeding Pipelines.mixSources — the REAL library path:
      // the census collects to a driver map (bounded by stratum
      // cardinality, the temperatureRates contract), the acceptance is
      // the q160 seeded-md5 machinery. Strata = doc_id digit counts so
      // the census is skewed (the fixture's source column is uniform).
      val d = t(s, "documents").select(
        concat(lit("s"),
          length(col("doc_id").cast("string")).cast("string")).as("stratum"),
        col("doc_id"))
      val counts = d.groupBy("stratum").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val rates = graft.api.Pipelines.temperatureRates(counts, 0.5)
      graft.api.Pipelines.mixSources(d, "stratum", "doc_id", rates, seed = "tmix")
        .orderBy("stratum", "doc_id")
    },

    "q186_token_budget" -> { (s, _) =>
      // Pipelines.sampleToTokenBudget (the bucketed two-pass plan) picks
      // the membership; the running sum re-derives over the kept rows —
      // the kept set is a PREFIX of the (hash, id) order, so its cumsum
      // equals the oracle's global-window values row for row. The window
      // is PARTITIONED by the same hash-prefix bucket the op cuts with
      // (driver-cumsum'd bucket offsets added back), so no corpus-scale
      // single-partition window exists anywhere in the plan — the
      // oracle's global window is the one-partition audit spelling.
      val docs = t(s, "documents").select("doc_id", "text")
      val kept = graft.api.Pipelines.sampleToTokenBudget(
          docs, "doc_id", "text", 20000L, seed = "tb")
        .localCheckpoint()
      val h = md5(concat_ws(":", lit("tb"), col("doc_id").cast("string")))
      val base = kept.select(col("doc_id"),
          coalesce(size(split(col("text"), " ")), lit(0)).as("n_tok"),
          h.as("__h"), substring(h, 1, 2).as("__b"))
      val sums = base.groupBy("__b").agg(sum(col("n_tok").cast("bigint")).as("__s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
      // Exclusive prefix sums in bucket order: each bucket's offset is
      // the total tokens of every bucket before it.
      val offsets = sums.map(_._1)
        .zip(sums.scanLeft(0L) { case (acc, (_, v)) => acc + v }.init).toMap
      val spark2 = s
      import spark2.implicits._
      val off = offsets.toSeq.toDF("__b", "__off")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("__b")
        .orderBy(col("__h"), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      base.join(broadcast(off), "__b")
        .withColumn("run",
          sum(col("n_tok").cast("bigint")).over(w) + col("__off"))
        .select("doc_id", "n_tok", "run")
        .orderBy("doc_id")
    },

    "q187_signed_netting" -> { (s, _) =>
      // The SignedEdgeStore presence contract (round 14), declared: an
      // integer action log (pair, sign, batch) nets to its PRESENT pairs
      // under the loops' exact two-step semantics — within-batch
      // add-wins (canonBatch: one action per pair per batch, an upsert
      // beats a removal), then LAST-ACTION-WINS across batches
      // (max_by(sign, b) — set semantics, not a sum: duplicate adds
      // never need two removals). The across-batch netting runs through
      // the REAL library kernel (SignedEdgeStore.net — what ClusterLoop/
      // RankLoop/LabelLoop fold through); ties are impossible by
      // construction after the per-(pair, batch) collapse, which is
      // exactly the store's one-row-per-pair-per-batch invariant.
      val li = t(s, "lineitem")
      val log = li.select(
        concat(lit("a"), (col("l_partkey") % 50).cast("string")).as("lo"),
        concat(lit("b"), (col("l_suppkey") % 50).cast("string")).as("hi"),
        when(col("l_quantity").cast("bigint") % 2 === 0, 1)
          .otherwise(-1).as("sign"),
        col("l_orderkey").as("b"))
      val perBatch = log.groupBy("lo", "hi", "b")
        .agg(max(col("sign")).as("sign"))
      graft.streaming.SignedEdgeStore.net(perBatch, "lo", "hi")
        .orderBy("lo", "hi")
    },

    "q188_map_merge" -> { (s, _) =>
      // Additive map merge with union-key semantics: two present-keys-only
      // status→count maps per customer (low/high order-value halves)
      // through map_zip_with (missing side contributes 0), rendered under
      // the H16 sorted-entries discipline + a try_element_at probe.
      val c = t(s, "orders")
        .groupBy(col("o_custkey"), col("o_orderstatus").as("st"))
        .agg(
          sum(when(col("o_totalprice") < 150000, 1).otherwise(0))
            .cast("bigint").as("lo_cnt"),
          sum(when(col("o_totalprice") >= 150000, 1).otherwise(0))
            .cast("bigint").as("hi_cnt"))
      val m = c.groupBy("o_custkey").agg(
        map_from_entries(array_sort(collect_list(
          when(col("lo_cnt") > 0, struct(col("st"), col("lo_cnt")))))).as("m1"),
        map_from_entries(array_sort(collect_list(
          when(col("hi_cnt") > 0, struct(col("st"), col("hi_cnt")))))).as("m2"))
      m.select(col("o_custkey"),
          map_zip_with(col("m1"), col("m2"),
            (_, a, b) => coalesce(a, lit(0L)) + coalesce(b, lit(0L))).as("mm"))
        .select(col("o_custkey"),
          size(col("mm")).cast("bigint").as("n_keys"),
          coalesce(try_element_at(col("mm"), lit("O")), lit(0L)).as("open_cnt"),
          array_join(transform(array_sort(map_entries(col("mm"))),
            e => concat(e.getField("key"), lit(":"),
              e.getField("value").cast("string"))), ",").as("entries"))
        .orderBy("o_custkey").limit(300)
    },

    "q189_netted_components" -> { (s, _) =>
      // The full ClusterLoop semantics at a fixed edge set: q187's
      // two-step netting through the REAL SignedEdgeStore kernel, then
      // the q72 iterative component machinery over the present pairs
      // (the Spark-side lowering of the recursive-reachability oracle —
      // the q72 dialect split, see Corpus). Block-diagonal pair space
      // guarantees ≥5 structural components.
      val li = t(s, "lineitem")
      val log = li.select(
        concat(lit("a"), (col("l_partkey") % 25).cast("string")).as("lo"),
        concat(lit("b"),
          (((col("l_partkey") % 25) / 5).cast("bigint") * 5 +
            col("l_suppkey") % 5).cast("string")).as("hi"),
        when(col("l_quantity").cast("bigint") % 2 === 0, 1)
          .otherwise(-1).as("sign"),
        col("l_orderkey").as("b"))
      val perBatch = log.groupBy("lo", "hi", "b")
        .agg(max(col("sign")).as("sign"))
      val present = graft.streaming.SignedEdgeStore.net(perBatch, "lo", "hi")
      graft.ops.DedupOps.connectedComponents(
          present.select(col("lo").as("d1"), col("hi").as("d2")))
        .orderBy("doc")
    },

    "q190_fuzzy_decontam" -> { (s, _) =>
      // The REAL fuzzy-decontamination operator: cross-set MinHash-LSH
      // at threshold 0.8 (auto banding k=30/bands=6), eval side = the
      // id<10 docs' texts. Output = contaminated corpus ids.
      val docs = t(s, "documents")
      graft.ops.DedupOps.crossNearDup(docs, col("doc_id"), col("text"),
          docs.where(col("doc_id") < 10).select(col("text")), col("text"),
          threshold = 0.8)
        .orderBy("doc_id")
    },

    "q108_regex_backref" -> { (s, _) =>
      // Backreference dialect split documented at the query level: Spark
      // $1 vs DuckDB \1 — the regex and semantics are identical.
      t(s, "part").select(col("p_partkey"),
          regexp_replace(col("p_name"), "^(\\w+) (\\w+)", "$2 $1").as("swapped"))
        .orderBy("p_partkey").limit(300)
    },

    "q106_moments" -> { (s, _) =>
      // Two-pass central moments: the mean is a one-row aggregate
      // broadcast back over the data (crossJoin of a single row), then
      // one hash agg of powered deviations — no window, no collect.
      val bal = t(s, "customer").select(col("c_acctbal").cast("double").as("bal"))
      val mu = bal.agg(avg(col("bal")).as("mu"))
      val d = bal.crossJoin(broadcast(mu))
      // `+ 0` on the near-zero outputs: IEEE -0.0 + 0 = +0.0 (H17 — the
      // engines render the sign of a rounded zero differently).
      d.agg(count(lit(1)).as("n"),
          (round(avg(col("bal") - col("mu")), 4) + lit(0)).as("centered_mean"),
          round(avg(pow(col("bal") - col("mu"), 2)), 4).as("m2"),
          (round(avg(pow(col("bal") - col("mu"), 3)) /
            pow(avg(pow(col("bal") - col("mu"), 2)), 1.5), 6) + lit(0)).as("skew_pop"),
          round(avg(pow(col("bal") - col("mu"), 4)) /
            pow(avg(pow(col("bal") - col("mu"), 2)), 2) - 3, 6).as("kurt_excess"))
    },

    "q105_sample_exact_k" -> { (s, _) =>
      // Deterministic exact-k stratified sample via the Pipelines op —
      // the declared twin verifies the seeded-hash ranking cross-engine.
      graft.api.Pipelines.sampleExactK(
          t(s, "documents").select("source", "doc_id"), "source", "doc_id", 7)
        .orderBy("source", "doc_id")
    },

    "q104_week_rollup" -> { (s, _) =>
      // ISO-Monday week rollup; one hash agg, datediff over the group's
      // min/max — the calendar shape of every ingestion dashboard.
      t(s, "events")
        .groupBy(date_trunc("week", col("ts")).as("wk"), col("event_type"))
        .agg(count(lit(1)).as("c"),
          datediff(max(col("ts")), min(col("ts"))).cast("long").as("span_days"))
        .orderBy("wk", "event_type").limit(300)
    },

    "q103_safe_parse" -> { (s, _) =>
      // Row-absent-not-job-fatal parsing: try_cast nulls malformed
      // numerics (ANSI cast would throw), nullif makes zero-divisors
      // NULL-poison — both pure projections, no shuffle before the sort.
      t(s, "part")
        .select(col("p_partkey"),
          when(col("p_partkey") % 3 === 0, col("p_size").cast("string"))
            .when(col("p_partkey") % 3 === 1,
              concat(col("p_size").cast("string"), lit("x")))
            .otherwise(lit("")).as("raw"),
          col("p_size"), col("p_retailprice").cast("double").as("price"))
        .select(col("p_partkey"), col("raw"),
          col("raw").try_cast("int").as("parsed"),
          coalesce(col("raw").try_cast("int"), lit(-1)).as("parsed_filled"),
          round(col("price") / nullif(col("p_size") - 5, lit(0)), 4).as("ratio"))
        .orderBy("p_partkey").limit(300)
    },

    "q102_grouping_flags" -> { (s, _) =>
      // Rollup with REAL nulls in the data column: grouping() is the only
      // thing separating a '(null)' detail row from a subtotal row — the
      // coalesce-rendering q43-45 use would silently merge them.
      t(s, "lineitem")
        .select(col("l_returnflag").as("rf"),
          when(col("l_linestatus") === "O", lit(null).cast("string"))
            .otherwise(col("l_linestatus")).as("ls"))
        .rollup(col("rf"), col("ls"))
        .agg(grouping(col("rf")).cast("long").as("g_rf"),
          grouping(col("ls")).cast("long").as("g_ls"),
          count(lit(1)).as("c"))
        .select(coalesce(col("rf"), lit("(total)")).as("rf_g"),
          coalesce(col("ls"), lit("(null)")).as("ls_g"),
          col("g_rf"), col("g_ls"), col("c"))
        .orderBy("g_rf", "g_ls", "rf_g", "ls_g")
    },

    "q100_ntile_median" -> { (s, _) =>
      // Quantile binning + per-bin stats: ntile PARTITIONED per nation
      // (un-partitioned ntile funnels the table through one task — the
      // PlanSpec-swept scale killer); order key includes unique c_custkey
      // so bucket assignment is deterministic.
      val d = t(s, "customer").select(col("c_nationkey"), col("c_custkey"),
        col("c_acctbal").cast("double").as("bal"),
        ntile(4).over(Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal"), col("c_custkey"))).as("q"))
      d.groupBy("c_nationkey", "q")
        .agg(count(lit(1)).as("n"),
          round(min(col("bal")), 2).as("lo"),
          round(max(col("bal")), 2).as("hi"),
          round(median(col("bal")).cast("double"), 4).as("med"))
        .orderBy("c_nationkey", "q")
    },

    "q101_array_setops" -> { (s, _) =>
      // Array set ops under the canonical sorted-joined render (H16):
      // array_intersect is DISTINCT by definition in both the engine and
      // the relational oracle; the self-join is an equi join on doc_id+1.
      val tok = t(s, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      tok.as("a").join(tok.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
          array_sort(array_intersect(col("a.w"), col("b.w"))).as("common"))
        .where(size(col("common")) > 0)
        .select(col("i"), col("j"),
          size(col("common")).cast("long").as("n_common"),
          array_join(col("common"), " ").as("common"))
        .orderBy("i").limit(300)
    },

    "q97_unpivot" -> { (s, _) =>
      // Wide → long via the typed unpivot API (inverse of q40's pivot);
      // a narrow generate step, no shuffle until the final order.
      t(s, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("extendedprice"),
          col("l_discount").cast("double").as("discount"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("extendedprice"), col("discount")), "k", "v")
        .select(col("l_orderkey"), col("l_linenumber"), col("k"),
          round(col("v"), 4).as("v"))
        .orderBy("l_orderkey", "l_linenumber", "k", "v").limit(300)
    },

    "q96_centroids" -> { (s, _) =>
      // The k-means recenter step (Ann.recenter's per-dim agg), declared
      // as long rows over the q59 fixture clustering. posexplode pos is
      // 0-based; the contract is 1-based (DuckDB generate_subscripts).
      t(s, "embeddings")
        .select((col("vec_id") % 8).as("cid"), posexplode(col("embedding")))
        .groupBy(col("cid"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("m"))
        .select(col("cid"), (col("pos") + 1).cast("long").as("pos"), col("m"))
        .orderBy("cid", "pos").limit(300)
    },

    "q95_locf" -> { (s, _) =>
      // Forward-fill: last non-null reading per user carried forward
      // (IGNORE NULLS running window — one shuffle on user_id, same frame
      // as the running totals family).
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_id") % 3 === 0, lit(null))
            .otherwise(round(col("value"), 4)).as("v_sparse"))
        .withColumn("v_filled", last(col("v_sparse"), ignoreNulls = true).over(w))
        .orderBy(col("user_id"), col("ts"), col("event_id")).limit(300)
        .select("event_id", "user_id", "v_sparse", "v_filled")
    },

    "q91_incremental_dedup" -> { (s, _) =>
      // Cross-run incremental dedup: the batch (doc_id >= 150) dedups
      // against ONLY the persisted fingerprint state of the prior corpus —
      // the oracle computes the from-scratch UNION dedup restricted to the
      // batch, so this hash gate proves the incremental join's union-min
      // semantics. Native minhash_sig signatures group identically to the
      // oracle's md5-hex minima (same 48-bit values — the q54 gate).
      val docs = t(s, "documents")
      val prior = DedupOps.fingerprintTable(
        docs.where(col("doc_id") < 150), col("doc_id"), col("text"))
      DedupOps.incrementalDedup(
          docs.where(col("doc_id") >= 150), col("doc_id"), col("text"), prior)
        .orderBy("doc_id").limit(300)
    },

    "q83_window_distribution" -> { (s, _) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("o_orderkey"), 2)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .as("second_key"))
        .orderBy("o_custkey", "o_orderkey").limit(300)
    },

    "q86_lateral_top1" -> { (s, _) =>
      // Lateral top-1-per-key lowered to its scale-safe shape: a
      // per-customer ranking window (rank limit pushes to WindowGroupLimit)
      // instead of a correlated subquery per outer row.
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val top1 = t(s, "orders")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      t(s, "customer").join(top1, col("c_custkey") === col("o_custkey"))
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey").limit(200)
    },
  )

  /** Training-data pipeline extensions over the ops layer. */
  private def textAndVector: Map[String, Impl] = Map(
    "q61_tfidf" -> { (s, _) =>
      val tok = t(s, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
      val n = t(s, "documents").agg(count(lit(1)).as("nd"))
      tf.join(dfreq, "w").crossJoin(broadcast(n))
        .select(col("doc_id"), col("w"),
          round(col("tf") * log(col("nd").cast("double") / col("df")), 6).as("tfidf"))
        .orderBy(col("tfidf").desc, col("doc_id"), col("w")).limit(100)
    },

    "q62_stopword_removal" -> { (s, _) =>
      val isStop = (w: Column) => TextOps.defaultStopwords.map(w === _).reduce(_ || _)
      val toks = TextOps.tokens(col("text"))
      val kept = filter(toks, w => !isStop(w))
      t(s, "documents")
        .select(col("doc_id"),
          array_join(kept, " ").as("cleaned"),
          (size(toks) - size(kept)).as("removed"))
        .orderBy("doc_id").limit(300)
    },

    "q63_redaction" -> { (s, _) =>
      t(s, "documents")
        .select(col("doc_id"),
          regexp_count(col("text"), lit("[0-9]+")).as("n_num"),
          regexp_replace(col("text"), "[0-9]+", "<NUM>").as("redacted"))
        .orderBy("doc_id").limit(200)
    },

    "q64_length_histogram" -> { (s, _) =>
      t(s, "documents")
        .groupBy(floor(length(col("text")) / 100).cast("bigint").as("bucket"))
        .agg(count(lit(1)).as("c"),
          min(length(col("text"))).as("mn"),
          max(length(col("text"))).as("mx"))
        .orderBy("bucket")
    },

    "q65_inverted_index" -> { (s, _) =>
      DedupOps.tokenSet(t(s, "documents"), col("doc_id"), col("text"))
        .groupBy("w")
        .agg(count(lit(1)).as("df"),
          array_join(transform(sort_array(collect_list(col("doc_id"))),
            _.cast("string")), ",").as("docs"))
        .where(col("df") >= 20)
        .orderBy("w").limit(200)
    },

    "q66_embedding_stats" -> { (s, _) =>
      val e = col("embedding")
      t(s, "embeddings").select(col("vec_id"),
          round(VectorOps.norm2(e), 6).as("l2"),
          round(aggregate(e, lit(0.0), (a, x) => a + x.cast("double")) / size(e), 6).as("mean"),
          round(array_min(e).cast("double"), 6).as("mn"),
          round(array_max(e).cast("double"), 6).as("mx"))
        .orderBy("vec_id").limit(300)
    },

    "q67_event_funnel" -> { (s, _) =>
      // Same bucketed band-join shape as q14 (ops/TemporalOps.timeBandJoin):
      // the funnel's 1-hour attribution window becomes the bin width.
      val e1 = t(s, "events").where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("ts1"))
      val e2 = t(s, "events").where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("ts2"), col("event_id").as("pid"))
      TemporalOps.timeBandJoin(e1, e2, "user_id", "ts1", "ts2", 3600L)
        .groupBy("user_id")
        .agg(countDistinct(col("pid")).as("conversions"))
        .orderBy("user_id").limit(200)
    },

    "q68_pmi" -> { (s, _) =>
      val tok = t(s, "documents").select(col("doc_id"),
        posexplode(TextOps.tokens(col("text")))).toDF("doc_id", "pos", "w")
      val t2 = tok.select(col("doc_id").as("d2"), col("pos").as("p2"), col("w").as("w2"))
      val big = tok.join(t2, col("doc_id") === col("d2") && col("p2") === col("pos") + 1)
        .groupBy(col("w").as("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      val uni = tok.groupBy("w").agg(count(lit(1)).as("c"))
      val u1 = uni.select(col("w").as("w1"), col("c").as("c1"))
      val u2 = uni.select(col("w").as("w2"), col("c").as("c2"))
      val tot = tok.agg(count(lit(1)).as("n"))
      val totb = big.agg(sum(col("cb")).as("nb"))
      val pmi = round(log(
        (col("cb").cast("double") / col("nb").cast("double")) /
          ((col("c1").cast("double") / col("n").cast("double")) *
            (col("c2").cast("double") / col("n").cast("double")))), 6)
      big.join(u1, "w1").join(u2, "w2")
        .crossJoin(broadcast(tot)).crossJoin(broadcast(totb))
        .where(col("cb") >= 5)
        .select(concat(col("w1"), lit(" "), col("w2")).as("bg"), col("cb"), pmi.as("pmi"))
        .orderBy(col("pmi").desc, col("bg")).limit(100)
    },

    "q69_stable_split" -> { (s, _) =>
      val split = when(
        substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 1) <= "c",
        "train").otherwise("test")
      t(s, "documents").select(col("doc_id"), split.as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("c"), min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .orderBy("split")
    },

    "q70_token_entropy" -> { (s, _) =>
      val tok = t(s, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      val cnt = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      val n = tok.groupBy(col("doc_id").as("nd")).agg(count(lit(1)).as("n"))
      val p = col("c").cast("double") / col("n").cast("double")
      cnt.join(n, col("doc_id") === col("nd"))
        .groupBy("doc_id")
        .agg(round(-sum(p * log(p)), 6).as("entropy"), max(col("n")).as("n_tok"))
        .orderBy("doc_id").limit(300)
    },

    "q71_dup_cluster_stats" -> { (s, _) =>
      val g = t(s, "documents")
        .groupBy(md5(substring(col("text"), 1, 16)).as("h"))
        .agg(count(lit(1)).as("c"))
      g.groupBy(col("c").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          (col("cluster_size").cast("bigint") * count(lit(1))).as("docs_covered"))
        .orderBy("cluster_size")
    },

    "q72_dup_components" -> { (s, _) =>
      val toks = DedupOps.tokenSet(
        t(s, "documents").where(col("doc_id") < 200), col("doc_id"), col("text"))
      val pairs = DedupOps.pairwiseJaccard(toks, "w", 0.8)
      DedupOps.connectedComponents(pairs)
        .select(col("doc").as("doc"), col("label"))
        .orderBy("doc")
    },

    "q73_retention_cohorts" -> { (s, _) =>
      val d = t(s, "events")
        .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      val c = d.groupBy(col("user_id").as("cu")).agg(min(col("day")).as("cohort"))
      d.join(c, col("user_id") === col("cu"))
        .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("offset_days"))
        .agg(countDistinct(col("user_id")).as("active"))
        .select(col("cohort").cast("timestamp").as("cohort"),
          col("offset_days"), col("active"))
        .orderBy("cohort", "offset_days").limit(300)
    },

    "q74_rfm_segments" -> { (s, _) =>
      // Value-quartile buckets from percentile breakpoints: one tiny agg
      // broadcast to a per-row comparison — never a global un-partitioned
      // ntile window (single-task sort of every customer, three times).
      val r = t(s, "orders").groupBy("o_custkey").agg(
        max(col("o_orderdate")).as("last_o"),
        count(lit(1)).as("f"),
        sum(col("o_totalprice").cast(dec)).as("m"))
      val v = r.select(col("o_custkey"), col("f"),
        datediff(col("last_o").cast("date"), to_date(lit("1970-01-01")))
          .cast("double").as("rk"),
        col("f").cast("double").as("fv"),
        round(col("m").cast("double"), 4).as("mv"))
      val bp = v.agg(
        round(percentile(col("rk"), lit(0.25)), 4).as("r1"),
        round(percentile(col("rk"), lit(0.5)), 4).as("r2"),
        round(percentile(col("rk"), lit(0.75)), 4).as("r3"),
        round(percentile(col("fv"), lit(0.25)), 4).as("f1"),
        round(percentile(col("fv"), lit(0.5)), 4).as("f2"),
        round(percentile(col("fv"), lit(0.75)), 4).as("f3"),
        round(percentile(col("mv"), lit(0.25)), 4).as("m1"),
        round(percentile(col("mv"), lit(0.5)), 4).as("m2"),
        round(percentile(col("mv"), lit(0.75)), 4).as("m3"))
      def bucket(x: Column, q1: Column, q2: Column, q3: Column): Column =
        lit(1) + (x > q1).cast("int") + (x > q2).cast("int") + (x > q3).cast("int")
      v.crossJoin(broadcast(bp))
        .select(col("o_custkey"), col("f"), col("mv"),
          bucket(col("rk"), col("r1"), col("r2"), col("r3")).as("r_bucket"),
          bucket(col("fv"), col("f1"), col("f2"), col("f3")).as("f_bucket"),
          bucket(col("mv"), col("m1"), col("m2"), col("m3")).as("m_bucket"))
        .orderBy("o_custkey").limit(300)
    },

    "q75_group_percentile" -> { (s, _) =>
      t(s, "orders").groupBy("o_orderpriority").agg(
          round(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
          round(percentile(col("o_totalprice"), lit(0.9)), 4).as("p90"),
          count(lit(1)).as("c"))
        .orderBy("o_orderpriority")
    },

    "q50_langid" -> { (s, _) =>
      t(s, "documents")
        .select(col("doc_id"),
          TextOps.tokenCountD(col("text")).as("n_tok"),
          TextOps.stopwordHits(col("text")).as("hits"))
        .select(col("doc_id"), col("n_tok"),
          round(col("hits") / col("n_tok"), 4).as("stop_ratio"),
          when(col("hits") / col("n_tok") >= 0.04, "en").otherwise("und").as("lang_guess"))
        .orderBy("doc_id").limit(300)
    },

    "q51_quality" -> { (s, _) =>
      t(s, "documents").select(col("doc_id"),
          length(col("text")).as("n_chars"),
          size(TextOps.tokens(col("text"))).as("n_tok"),
          round(TextOps.typeTokenRatio(col("text")), 4).as("ttr"),
          round(TextOps.avgWordLen(col("text")), 4).as("avg_wlen"),
          TextOps.qualityVerdict(col("text")).as("verdict"))
        .orderBy("doc_id").limit(300)
    },

    "q52_token_count" -> { (s, _) =>
      t(s, "documents").select(col("doc_id"),
          size(TextOps.tokens(col("text"))).as("ws_tokens"),
          TextOps.alphaTokenCount(col("text")).as("alpha_tokens"),
          TextOps.bpeIshTokenCount(col("text")).as("bpe_ish"),
          length(col("text")).as("n_chars"))
        .orderBy("doc_id").limit(300)
    },

    "q53_fingerprint" -> { (s, _) =>
      // Pure projection: the per-doc min/distinct fold over shingles runs
      // inside the row (HOFs) — no explode, no aggregation shuffle, no
      // join-back. Hash-identical to the relational lowering (min and
      // distinct-count over the same shingle multiset). The projection
      // sits AFTER the order+limit: the query's output depends only on
      // the 300 smallest doc_ids, so the per-row fingerprint math runs on
      // 300 rows, not the corpus — the plan a cluster should run. (The
      // unlimited pipeline form is Pipelines.fingerprints.)
      // NO null-text filter: the declared SQL's shingle source yields one
      // '' shingle for null text (greatest(NULL,1)=1; concat_ws of nulls
      // is ''), so such docs DO survive its inner join — with doc_fp NULL,
      // shingle_fp md5('')-prefix, n_shingles 1. This projection computes
      // exactly that.
      val shArr = TextOps.wordShingles(col("text"), 3)
      t(s, "documents")
        .orderBy("doc_id").limit(300)
        .select(col("doc_id"), TextOps.docFingerprint(col("text")).as("doc_fp"),
          array_min(transform(shArr, sh => TextOps.shingleHash(sh))).as("shingle_fp"),
          size(array_distinct(shArr)).cast("bigint").as("n_shingles"))
    },

    "q54_minhash_sig" -> { (s, _) =>
      // The native single-pass minhash_sig expression, oracle-gated: its
      // Array[Long] minima formatted as 12-hex equal the declared
      // substr(md5,1,12) strings exactly (lexicographic min of fixed-width
      // lowercase hex ≡ numeric min of the 48-bit value). One projection —
      // no token explode, no signature aggregation.
      // The declared SQL's explode drops null-text docs entirely; filter
      // so the native-expression lowering does too.
      val sig = call_function("minhash_sig", TextOps.tokens(col("text")), lit(4))
      t(s, "documents").where(col("text").isNotNull)
        .select(col("doc_id"), sig.as("sig"))
        .select(col("doc_id") +:
          (1 to 4).map(i => format_string("%012x", element_at(col("sig"), i)).as(s"h$i")): _*)
        .orderBy("doc_id").limit(300)
    },

    "q55_minhash_lsh" -> { (s, _) =>
      val toks = DedupOps.tokenSet(
        t(s, "documents").where(col("doc_id") < 200), col("doc_id"), col("text"))
      DedupOps.minhashLsh(toks, k = 8, bands = 4, threshold = 0.8)
        .orderBy("d1", "d2").limit(200)
    },

    "q56_simhash" -> { (s, _) =>
      val toks = DedupOps.tokenSet(t(s, "documents"), col("doc_id"), col("text"))
      DedupOps.simhash(toks, 16).orderBy("doc_id").limit(300)
    },

    "q57_charngram_jaccard" -> { (s, _) =>
      val sh = DedupOps.charShingleSet(
        t(s, "documents").where(col("doc_id") < 100), col("doc_id"), col("text"), 3)
      DedupOps.pairwiseJaccard(sh, "sh", 0.55).orderBy("d1", "d2").limit(200)
    },

    "q58_embedding_neardup" -> { (s, _) =>
      // The guarded audit form: Ann.allPairsCosine throws past its size
      // bound instead of silently going quadratic; q76 is the LSH twin.
      Ann.allPairsCosine(t(s, "embeddings"), threshold = 0.44)
        .orderBy("d1", "d2").limit(200)
    },

    "q76_embedding_neardup_lsh" -> { (s, _) =>
      Ann.neardupLsh(t(s, "embeddings"), threshold = 0.44)
        .orderBy("d1", "d2").limit(200)
    },

    "q78_repetition_ratio" -> { (s, _) =>
      // Output depends only on the 300 smallest doc_ids → limit first,
      // then the per-row n-gram HOFs touch 300 rows, not the corpus (the
      // unlimited per-row form is what a pipeline filter applies).
      val sh = TextOps.wordShingles(col("text"), 3)
      t(s, "documents").orderBy("doc_id").limit(300)
        .select(col("doc_id"),
          size(sh).cast("bigint").as("n_ngrams"),
          TextOps.repetitionRatio(col("text"), 3).as("rep_ratio"))
    },

    "q79_contamination" -> { (s, _) =>
      // Probe side (held-out docs) is tiny by construction → broadcast;
      // the corpus side is filtered by the hash join without shuffling.
      val docs = t(s, "documents")
      def sh(df: DataFrame) = DedupOps.wordShingleSet(df, col("doc_id"), col("text"))
      val probe = sh(docs.where(col("doc_id") < 10)).select("sh").distinct()
      val corp = sh(docs.where(col("doc_id") >= 10))
      corp.join(broadcast(probe), "sh")
        .groupBy("doc_id").agg(count(lit(1)).as("hits"))
        .orderBy(col("hits").desc, col("doc_id")).limit(200)
    },

    "q81_heavy_hitters" -> { (s, _) =>
      // Count-min prefilter: the exchange carries candidate 3-grams only
      // (superset of the true heavy hitters — count-min never undercounts);
      // the exact recount + re-threshold makes the result identical to the
      // sketch-free GROUP BY/HAVING oracle.
      val grams = t(s, "documents").select(
        explode(TextOps.wordShingles(col("text"), 3)).as("sh"))
      SketchOps.heavyHitters(grams, "sh", minCount = 5)
        .orderBy(col("c").desc, col("sh")).limit(200)
    },

    "q82_bloom_contamination" -> { (s, _) =>
      // Bloom prefilter on the corpus side (built from the tiny held-out
      // shingle set), exact semi join on the survivors — same result as the
      // IN-subquery oracle, but at scale the corpus rows that cannot match
      // die before any exchange.
      val docs = t(s, "documents")
      def sh(df: DataFrame) = DedupOps.wordShingleSet(df, col("doc_id"), col("text"))
      val probe = sh(docs.where(col("doc_id") < 10)).select("sh").distinct()
      val corp = sh(docs.where(col("doc_id") >= 10))
      SketchOps.bloomSemiJoin(corp, "sh", probe, "sh")
        .select("doc_id").distinct()
        .orderBy("doc_id").limit(200)
    },

    "q80_quality_embedding_join" -> { (s, _) =>
      val toks = TextOps.tokens(col("text"))
      t(s, "documents")
        .where(size(toks) >= 30 && size(array_distinct(toks)) >= 15)
        .join(t(s, "embeddings"), col("vec_id") === col("doc_id"))
        .select(col("doc_id"), round(VectorOps.norm2(col("embedding")), 6).as("l2"))
        .orderBy("doc_id").limit(200)
    },

    "q59_ann_ivf" -> { (s, _) =>
      val emb = t(s, "embeddings")
      val clu = Ann.ivfAssign(emb.where(col("vec_id") >= 8),
        emb.where(col("vec_id") < 8))
      val probes = clu.where(col("vec_id") >= 490)
        .select(col("vec_id").as("probe"), col("cid"))
        .join(emb.select(col("vec_id").as("probe"), col("embedding").as("p_emb")), Seq("probe"))
      val gal = clu.where(col("vec_id") < 490)
        .select(col("vec_id").as("cand"), col("cid").as("gcid"))
        .join(emb.select(col("vec_id").as("cand"), col("embedding").as("g_emb")), Seq("cand"))
      probes.join(gal, col("cid") === col("gcid"))
        .withColumn("s", VectorOps.cosine6Native(col("p_emb"), col("g_emb")))
        .groupBy("probe")
        .agg(max_by(struct(col("cid"), col("cand"), col("s")),
          struct(nanvl(col("s"), lit(-2.0)), -col("cand"))).as("m"))
        .select(col("probe"), col("m.cid").as("cid"),
          col("m.cand").as("cand"), col("m.s").as("s"))
        .orderBy("probe")
    },

    "q60_ann_lsh" -> { (s, _) =>
      val emb = t(s, "embeddings")
      val bk = emb.select(col("vec_id"),
        Ann.hyperplaneBucket(col("embedding"), 4).as("bucket"))
      val probes = emb.where(col("vec_id") >= 490)
        .select(col("vec_id").as("probe"), col("embedding").as("p_emb"))
        .join(bk.select(col("vec_id").as("probe"), col("bucket")), Seq("probe"))
      val gal = bk.where(col("vec_id") >= 8 && col("vec_id") < 490)
        .select(col("vec_id").as("cand"), col("bucket").as("gbucket"))
        .join(emb.select(col("vec_id").as("cand"), col("embedding").as("g_emb")), Seq("cand"))
      probes.join(gal, col("bucket") === col("gbucket"))
        .withColumn("s", VectorOps.cosine6Native(col("p_emb"), col("g_emb")))
        .groupBy("probe")
        .agg(max_by(struct(col("bucket"), col("cand"), col("s")),
          struct(nanvl(col("s"), lit(-2.0)), -col("cand"))).as("m"))
        .select(col("probe"), col("m.bucket").as("bucket"),
          col("m.cand").as("cand"), col("m.s").as("s"))
        .orderBy("probe")
    },

    "q84_editdistance_blocked" -> { (s, _) =>
      // Fuzzy-match (typo) dedup at the VOCABULARY level: collapse the
      // corpus to (name, count) first, then levenshtein within
      // equal-prefix blocks. The distinct-name relation is tiny relative
      // to the corpus, so block populations stay bounded where
      // occurrence-level blocking is quadratic (25k-row blocks at 200k
      // parts — measured).
      val names = t(s, "part").groupBy("p_name").agg(count(lit(1)).as("c"))
      val n1 = names.select(col("p_name").as("a"), col("c").as("c1"),
        substring(col("p_name"), 1, 4).as("blk"))
      val n2 = names.select(col("p_name").as("b"), col("c").as("c2"),
        substring(col("p_name"), 1, 4).as("blk"))
      // Threshold form early-exits the DP at distance > 4 (returns -1):
      // O(threshold·len) per pair instead of O(len²), same distances for
      // every kept pair.
      val d = levenshtein(col("a"), col("b"), 4)
      n1.join(n2, Seq("blk")).where(col("a") < col("b"))
        .where(d >= 0)
        .select(col("a"), col("b"), d.cast("bigint").as("d"),
          col("c1"), col("c2"))
        .orderBy("a", "b").limit(200)
    },

    "q85_source_report" -> { (s, _) =>
      t(s, "documents").groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextOps.tokens(col("text"))).cast("bigint")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("source", "lang")
    },
  )

  def extra: Map[String, Impl] = Map()

  def extraOracles: Map[String, String] = Map()
}
