package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The sketch-accelerated operators must be EXACT (the sketch only prunes
  * candidate rows; one-sidedness + exact verify restores the true answer)
  * and must prune before the shuffle. */
class SketchOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def shingles(flt: String) = {
    val d = TestSpark.table("documents").where(flt)
    d.select(col("doc_id"),
        explode(TextOps.wordShingles(col("text"), 3)).as("sh"))
      .distinct()
  }

  test("bloomSemiJoin equals the plain semi join (string keys)") {
    val probe = shingles("doc_id < 10").select("sh").distinct()
    val corp = shingles("doc_id >= 10")
    val exact = corp.join(probe, Seq("sh"), "left_semi")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val viaBloom = SketchOps.bloomSemiJoin(corp, "sh", probe, "sh")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(viaBloom == exact)
    assert(exact.nonEmpty) // the check is vacuous on an empty overlap
  }

  test("bloomSemiJoin equals the plain semi join (long keys)") {
    val orders = TestSpark.table("orders")
    val custs = TestSpark.table("customer")
      .where(col("c_custkey") % 7 === 0).select(col("c_custkey"))
    val exact = orders.join(custs, col("o_custkey") === col("c_custkey"), "left_semi")
      .agg(count(lit(1)), sum(col("o_orderkey"))).head()
    val viaBloom = SketchOps.bloomSemiJoin(orders, "o_custkey", custs, "c_custkey")
      .agg(count(lit(1)), sum(col("o_orderkey"))).head()
    assert(viaBloom == exact)
    assert(exact.getLong(0) > 0)
  }

  test("bloom prefilter sits under the join: survivors-only reach the exchange") {
    val probe = shingles("doc_id < 10").select("sh").distinct()
    val corp = shingles("doc_id >= 10")
    val plan = SketchOps.bloomSemiJoin(corp, "sh", probe, "sh")
      .queryExecution.executedPlan.toString
    // The probe must appear in a Filter node (pushed to the scan side),
    // not be evaluated post-join.
    val filterIdx = plan.linesIterator.indexWhere(l =>
      l.contains("Filter") && l.contains("bloom_might_contain"))
    val joinIdx = plan.linesIterator.indexWhere(_.contains("LeftSemi"))
    assert(filterIdx >= 0, s"no bloom filter node in:\n$plan")
    assert(joinIdx >= 0 && filterIdx > joinIdx, // deeper in the tree = later line
      s"bloom filter not below the semi join in:\n$plan")
  }

  test("binary-key probes equal the String API on df.stat-built sketches") {
    // The native probes hash a string key as its raw UTF-8 bytes (no
    // per-row String allocation); Spark's sketches define putString as
    // putBinary(utf8), so the two APIs must agree key for key — including
    // non-ASCII code points.
    import spark.implicits._
    val keys = Seq("alpha", "Ωmega", "naïve", "数据", "", "k1")
    val df = (keys ++ keys.take(2)).toDF("k")
    val bloomBytes = SketchOps.bloomBytes(df, "k")
    val cmsBytes = SketchOps.cmsBytes(df, "k")
    val bf = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bloomBytes))
    val cm = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(cmsBytes))
    val probed = (keys :+ "absent-key").toDF("k")
      .select(col("k"), SketchOps.bloomProbe(bloomBytes, col("k")).as("b"),
        SketchOps.cmsProbe(cmsBytes, col("k")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    for (k <- keys :+ "absent-key") {
      assert(probed(k)._1 == bf.mightContainString(k), s"bloom differs on '$k'")
      assert(probed(k)._2 == cm.estimateCount(k), s"cms differs on '$k'")
    }
  }

  test("heavyHitters equals exact GROUP BY + HAVING, counts included") {
    val toks = TestSpark.table("documents")
      .select(explode(TextOps.tokens(col("text"))).as("w"))
    val exact = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .where(col("c") >= 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaCms = SketchOps.heavyHitters(toks, "w", minCount = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaCms == exact)
    assert(exact.nonEmpty)
  }

  test("cms_estimate never undercounts (the property exactness rests on)") {
    val toks = TestSpark.table("documents")
      .select(explode(TextOps.tokens(col("text"))).as("w"))
    val sketch = SketchOps.cmsBytes(toks, "w")
    val viol = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .where(SketchOps.cmsProbe(sketch, col("w")) < col("c"))
      .count()
    assert(viol == 0)
  }

  test("HLL sketch table rolls up to any coarser grouping within 5% of exact") {
    import org.apache.spark.sql.functions._
    val ev = TestSpark.table("events")
      .withColumn("d", date_trunc("day", col("ts")))
    // Fine-grained sketches: day × event_type.
    val table = SketchOps.hllSketchTable(ev, "user_id", "d", "event_type")
    // Rollup 1: per event_type (merging across days).
    val byType = SketchOps.hllRollup(table, "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactByType = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.keySet == exactByType.keySet)
    byType.foreach { case (k, est) =>
      assert(math.abs(est - exactByType(k)) <= math.max(1L, (exactByType(k) * 0.05).toLong),
        s"$k: est=$est exact=${exactByType(k)}")
    }
    // Rollup 2: global, from the same sketch table.
    val global = SketchOps.hllRollup(table).head().getLong(0)
    val exactGlobal = ev.agg(countDistinct("user_id")).head().getLong(0)
    assert(math.abs(global - exactGlobal) <= math.max(1L, (exactGlobal * 0.05).toLong))
  }

  test("KLL sketch table answers rollup quantiles within rank tolerance") {
    import org.apache.spark.sql.functions._
    val ev = TestSpark.table("events")
      .withColumn("d", date_trunc("day", col("ts")))
    // Fine-grained sketches: day × event_type; roll up per type and global.
    val table = SketchOps.kllSketchTable(ev, "value", "d", "event_type")
    val byType = SketchOps.kllRollup(table, Seq(0.5, 0.95), "event_type")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // Rank check (principled for any distribution): the estimated
    // q-quantile's TRUE rank must be within q ± 3% per merged sketch.
    def trueRank(tpe: String, v: Double): Double = {
      val g = ev.where(col("event_type") === tpe)
      g.where(col("value").cast("double") <= v).count().toDouble /
        math.max(g.count(), 1L)
    }
    byType.foreach { case (tpe, (p50, p95)) =>
      assert(math.abs(trueRank(tpe, p50) - 0.5) <= 0.03, s"$tpe p50=$p50")
      assert(math.abs(trueRank(tpe, p95) - 0.95) <= 0.03, s"$tpe p95=$p95")
    }
    // Global rollup from the SAME sketch table (no raw re-read).
    val g = SketchOps.kllRollup(table, Seq(0.5)).head().getDouble(0)
    val n = ev.count().toDouble
    val gRank = ev.where(col("value").cast("double") <= g).count() / n
    assert(math.abs(gRank - 0.5) <= 0.03, s"global p50=$g rank=$gRank")
  }

  test("empty small side yields an empty semi join, not an error") {
    val corp = shingles("doc_id >= 10")
    val empty = shingles("doc_id < 0").select("sh").distinct()
    assert(SketchOps.bloomSemiJoin(corp, "sh", empty, "sh").count() == 0)
  }

  test("null keys never match and never error") {
    import spark.implicits._
    val big = Seq(Some("a"), None, Some("b"), Some("zz")).toDF("k")
    val small = Seq("a", "b").toDF("j")
    val r = SketchOps.bloomSemiJoin(big, "k", small, "j")
      .collect().map(_.getString(0)).toSet
    assert(r == Set("a", "b"))
  }

  test("BM25 index: indexed query ≡ ad-hoc ranker through builds, appends, and deletions") {
    val docs = TestSpark.table("documents").where(col("doc_id") < 200)
      .select("doc_id", "text").localCheckpoint()
    val terms = Seq("data", "stream")
    def adHoc(d: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      graft.api.Pipelines.bm25Rank(d, col("doc_id"), col("text"), terms)
        .collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    val root = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    val (tbl, path) = ("bm25_w", s"$root/idx")
    def indexed(): Map[Long, Double] =
      SketchOps.bm25QueryIndexed(spark, tbl, path, terms, buckets = 4)
        .collect().map(r => r.getLong(0) -> BigDecimal(r.getDouble(1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    try {
      // Build on the first half, query ≡ ad-hoc over that corpus.
      val b0 = docs.where(col("doc_id") < 100)
      SketchOps.persistBm25Index(
        SketchOps.buildBm25Index(b0, col("doc_id"), col("text")),
        tbl, path, buckets = 4)
      assert(indexed() == adHoc(b0))
      assert(indexed().nonEmpty, "vacuous fixture")
      // Append the second half: query ≡ ad-hoc over the union — df,
      // n_docs, and avgdl all absorbed the batch.
      val b1 = docs.where(col("doc_id") >= 100)
      SketchOps.appendBm25Index(spark, tbl, path, b1, col("doc_id"), col("text"),
        buckets = 4)
      assert(indexed() == adHoc(docs))
      // Takedown: a matching doc vanishes AND the ranking equals the
      // ad-hoc ranker over the SURVIVING corpus (df/avgdl corrected by
      // the negative stats delta, not just row filtering).
      val victim = indexed().keySet.min
      assert(SketchOps.deleteFromBm25Index(spark, tbl, path,
        docs.where(col("doc_id") === victim).select("doc_id"), buckets = 4) == 1L)
      assert(SketchOps.deleteFromBm25Index(spark, tbl, path,
        docs.where(col("doc_id") === victim).select("doc_id"), buckets = 4) == 0L)
      val after = indexed()
      assert(!after.contains(victim))
      assert(after == adHoc(docs.where(col("doc_id") =!= victim)),
        "post-deletion scores must equal the ad-hoc ranker over survivors")
      // Hygiene: re-appending an indexed id, an in-batch dup, a null id,
      // and empty terms all refuse.
      intercept[IllegalArgumentException] {
        SketchOps.appendBm25Index(spark, tbl, path, b1, col("doc_id"), col("text"),
          buckets = 4)
      }
      val spark2 = spark
      import spark2.implicits._
      intercept[IllegalArgumentException] {
        SketchOps.appendBm25Index(spark, tbl, path,
          Seq((9000L, "x"), (9000L, "y")).toDF("doc_id", "text"),
          col("doc_id"), col("text"), buckets = 4)
      }
      intercept[IllegalArgumentException] {
        SketchOps.appendBm25Index(spark, tbl, path,
          Seq((Option.empty[Long], "x")).toDF("doc_id", "text"),
          col("doc_id"), col("text"), buckets = 4)
      }
      intercept[IllegalArgumentException] {
        SketchOps.bm25QueryIndexed(spark, tbl, path, Nil, buckets = 4)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS `bm25_w_po`")
      spark.sql("DROP TABLE IF EXISTS `bm25_w_dl`")
    }
  }
}
