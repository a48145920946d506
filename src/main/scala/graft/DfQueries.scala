package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Ann, DedupOps, TextOps, VectorOps}

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

  def impls: Map[String, Impl] = Map(
    "q01_scan_filter_project" -> { (s, _) =>
      t(s, "lineitem")
        .where(col("l_quantity") > 45 &&
          col("l_shipdate") >= expr("timestamp '1997-01-01 00:00:00'"))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net"))
        .orderBy("l_orderkey", "l_linenumber").limit(100)
    },

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
      val docs = t(s, "documents")
      val sh = docs.select(col("doc_id"),
        explode(TextOps.wordShingles(col("text"), 3)).as("sh"))
      val fp = sh.groupBy("doc_id").agg(
        min(TextOps.shingleHash(col("sh"))).as("shingle_fp"),
        countDistinct(col("sh")).as("n_shingles"))
      docs.join(fp, "doc_id")
        .select(col("doc_id"), TextOps.docFingerprint(col("text")).as("doc_fp"),
          col("shingle_fp"), col("n_shingles"))
        .orderBy("doc_id").limit(300)
    },

    "q54_minhash_sig" -> { (s, _) =>
      val toks = DedupOps.tokenSet(t(s, "documents"), col("doc_id"), col("text"))
      DedupOps.minhashSignatures(toks, 4).orderBy("doc_id").limit(300)
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
      val emb = t(s, "embeddings")
      val a = emb.select(col("vec_id").as("d1"), col("embedding").as("a_emb"))
      val b = emb.select(col("vec_id").as("d2"), col("embedding").as("b_emb"))
      val sim = VectorOps.cosine6Native(col("a_emb"), col("b_emb"))
      a.join(b, col("d1") < col("d2"))
        .where(sim >= 0.44)
        .select(col("d1"), col("d2"), sim.as("s"))
        .orderBy("d1", "d2").limit(200)
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
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("probe")).orderBy(col("s").desc, col("cand"))))
        .where(col("rn") === 1)
        .select("probe", "cid", "cand", "s")
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
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("probe")).orderBy(col("s").desc, col("cand"))))
        .where(col("rn") === 1)
        .select("probe", "bucket", "cand", "s")
        .orderBy("probe")
    },
  )

  def extra: Map[String, Impl] = Map()

  def extraOracles: Map[String, String] = Map()
}
