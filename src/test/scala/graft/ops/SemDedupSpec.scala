package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SemDeDup (cluster-then-prune semantic dedup): the keep/drop contract on
  * hand-built geometry, the one-pass chain semantics, the documented
  * cross-cluster recall trade, single-cluster ≡ greedy-over-all-pairs, and
  * the plan shape (equi join on the cluster id, never a cartesian). */
class SemDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def embeddings = TestSpark.table("embeddings")

  import scala.jdk.CollectionConverters._
  private val embSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("vec_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("embedding",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))))

  private def embDf(rows: (Any, Seq[Float])*) =
    spark.createDataFrame(
      rows.map { case (i, v) =>
        org.apache.spark.sql.Row(i, if (v == null) null else v)
      }.asJava, embSchema)

  // Two well-separated unit directions in 2-d; vectors at explicit angles
  // make every cosine a known value (cos of the angle difference).
  private def at(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("semDedup drops exactly the smaller-id-dominated rows within a cluster") {
    // Centroids: A at 0 deg, B at 90 deg. Cluster A holds a near-dup pair
    // (0 deg, 10 deg: cos ~= 0.985) and one distinct member (40 deg,
    // cos(40) ~= 0.766 to both — below tau). Cluster B holds one row.
    val cents = embDf(0L -> at(0), 1L -> at(90))
    val emb = embDf(10L -> at(0), 11L -> at(10), 12L -> at(40), 13L -> at(88))
    val drops = Ann.semDedupDrops(emb, cents, 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(drops == Set(11L), s"expected only the 10-deg twin dropped, got $drops")
    val kept = Ann.semDedup(emb, cents, 0.9)
    assert(kept.columns.toSeq == Seq("vec_id", "embedding"))
    assert(kept.collect().map(_.getLong(0)).toSet == Set(10L, 12L, 13L))
  }

  test("one-pass chain contract: a dropped row still dominates its own neighbors") {
    // 0, 18, 36 deg with tau = 0.93 (cos 18 ~= 0.951 >= tau, cos 36 ~=
    // 0.809 < tau): 11 drops by 10; 12 drops by 11 even though 11 is
    // itself dropped — the documented greedy-by-id semantics.
    val cents = embDf(0L -> at(0))
    val emb = embDf(10L -> at(0), 11L -> at(18), 12L -> at(36))
    val drops = Ann.semDedupDrops(emb, cents, 0.93)
      .collect().map(_.getLong(0)).toSet
    assert(drops == Set(11L, 12L), s"chain must collapse to the smallest id, got drops=$drops")
  }

  test("cross-cluster near-dups are missed (the documented recall trade)") {
    // A at 0 deg, B at 40 deg. v1 at 0 (-> A), v2 at 22 (18 deg from B ->
    // B). cos(v1,v2) = cos 22 ~= 0.927 >= 0.9, but the pair spans clusters.
    val cents = embDf(0L -> at(0), 1L -> at(40))
    val emb = embDf(10L -> at(0), 11L -> at(22))
    assert(Ann.semDedupDrops(emb, cents, 0.9).count() == 0L)
    // Same pair, one cluster: found.
    assert(Ann.semDedupDrops(emb, embDf(0L -> at(0)), 0.9)
      .collect().map(_.getLong(0)).toSet == Set(11L))
  }

  test("null embeddings never match and always survive") {
    val cents = embDf(0L -> at(0))
    val emb = embDf(10L -> at(0), 11L -> at(5), 12L -> null)
    val kept = Ann.semDedup(emb, cents, 0.9).collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 12L))
  }

  test("single cluster reproduces greedy-by-id over exact all-pairs cosine") {
    val emb = embeddings.where(col("vec_id") < 60)
    val oneCent = embDf(0L -> at(0))
    val tau = 0.44
    val pairs = Ann.allPairsCosine(emb, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedDrops = pairs.map(_._2).toSet
    val drops = Ann.semDedupDrops(emb, oneCent, tau)
      .collect().map(_.getLong(0)).toSet
    assert(drops == expectedDrops,
      s"extra=${drops -- expectedDrops} missing=${expectedDrops -- drops}")
  }

  test("semDedupKFor scales k linearly with the corpus, floor 1") {
    assert(Ann.semDedupKFor(0) == 1)
    assert(Ann.semDedupKFor(100) == 1)
    assert(Ann.semDedupKFor(2560) == 10)
    assert(Ann.semDedupKFor(25600) == 100)   // 10x data -> 10x clusters
    assert(Ann.semDedupKFor(1000, targetCluster = 100) == 10)
  }

  test("drop-set plan is an equi join on the cluster id, never a cartesian") {
    val cents = embDf(0L -> at(0), 1L -> at(90))
    val plan = Ann.semDedupDrops(embeddings, cents, 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"within-cluster verify must stay keyed:\n$plan")
  }

  test("appendSemDedup: folded batch verdicts equal the one-shot prune; ids enforced monotone") {
    val spark2 = spark
    import spark2.implicits._
    val all = embeddings.where(col("vec_id") < 150).localCheckpoint()
    val b0 = all.where(col("vec_id") < 50)
    val b1 = all.where(col("vec_id") >= 50 && col("vec_id") < 100)
    val b2 = all.where(col("vec_id") >= 100)
    val cents = Ann.kmeans(all, 4, iters = 2).localCheckpoint()
    val tau = 0.35
    val root = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    try {
      Ann.persistSemDedupState(Ann.buildSemDedupState(b0, cents),
        "sem_w", s"$root/st", buckets = 4)
      val got1 = ids(Ann.appendSemDedup(spark, "sem_w", s"$root/st", b1, cents, tau, buckets = 4))
      val got2 = ids(Ann.appendSemDedup(spark, "sem_w", s"$root/st", b2, cents, tau, buckets = 4))
      // Contract: per-doc verdicts depend only on smaller-id docs, so the
      // fold's drops are the one-shot prune's drops restricted to
      // post-seed ids.
      val oneShot = ids(Ann.semDedupDrops(all, cents, tau))
      assert(got1.nonEmpty && got2.nonEmpty, "fixture must produce cross-batch drops")
      assert(got1.forall(i => i >= 50 && i < 100) && got2.forall(_ >= 100))
      assert((got1 ++ got2) == oneShot.filter(_ >= 50),
        s"fold diverged: extra=${(got1 ++ got2) -- oneShot} " +
          s"missing=${oneShot.filter(_ >= 50) -- got1 -- got2}")
      // Monotone-id contract: replaying b1 (ids below the indexed max) refuses.
      val eMono = intercept[IllegalArgumentException] {
        Ann.appendSemDedup(spark, "sem_w", s"$root/st", b1, cents, tau, buckets = 4)
      }
      assert(eMono.getMessage.contains("monotone"))
      // Id hygiene: in-batch dup and null ids refuse.
      intercept[IllegalArgumentException] {
        Ann.appendSemDedup(spark, "sem_w", s"$root/st",
          embDf(900L -> at(0), 900L -> at(0)), cents, tau, buckets = 4)
      }
      intercept[IllegalArgumentException] {
        Ann.appendSemDedup(spark, "sem_w", s"$root/st",
          embDf((null: Any) -> at(0)), cents, tau, buckets = 4)
      }
      // Non-numeric string ids pass the null/dup guards but cast to null
      // longs — the state would come out empty with no verdicts; the
      // cast guard must refuse loudly instead.
      val eCast = intercept[IllegalArgumentException] {
        Ann.appendSemDedup(spark, "sem_w", s"$root/st",
          Seq(("docA", at(0)), ("docB", at(40))).toDF("vec_id", "embedding"),
          cents, tau, buckets = 4)
      }
      assert(eCast.getMessage.contains("castable"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS `sem_w`")
    }
  }

  test("takedowns: a tombstoned doc stops dominating appendSemDedup; compaction restores") {
    // Single cluster at 0 deg; tau = 0.9 (cos 3 ~= 0.9986 matches,
    // cos 47 ~= 0.68 does not).
    val cents = embDf(0L -> at(0))
    val tau = 0.9
    val root = java.nio.file.Files.createTempDirectory("graft-semdedup-tk").toString
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    try {
      Ann.persistSemDedupState(
        Ann.buildSemDedupState(embDf(10L -> at(0), 11L -> at(50)), cents),
        "sem_tk", s"$root/st", buckets = 4)
      // Take down 10: a near-twin of it must now be ADMITTED (without the
      // tombstone it would drop against a doc that no longer exists).
      assert(Ann.deleteFromSemDedupState(spark, "sem_tk", s"$root/st",
        embDf(10L -> at(0)).select("vec_id"), buckets = 4) == 1L)
      // Idempotent re-delete and never-ingested ids are no-ops (0 live).
      assert(Ann.deleteFromSemDedupState(spark, "sem_tk", s"$root/st",
        embDf(10L -> at(0)).select("vec_id"), buckets = 4) == 0L)
      assert(Ann.deleteFromSemDedupState(spark, "sem_tk", s"$root/st",
        embDf(999L -> at(0)).select("vec_id"), buckets = 4) == 0L)
      // 20 (3 deg) only matched the tombstoned 10 -> kept; 21 (47 deg)
      // matches the LIVE 11 (50 deg, cos 3) -> dropped.
      val got = ids(Ann.appendSemDedup(spark, "sem_tk", s"$root/st",
        embDf(20L -> at(3), 21L -> at(47)), cents, tau, buckets = 4))
      assert(got == Set(21L), s"expected only the live-dominated drop, got $got")
      // Physical vs live: the victim's row survives physically, the live
      // view hides it, the bucketing survives the filter.
      val phys = Ann.loadSemDedupState(spark, "sem_tk", s"$root/st", buckets = 4)
      val live = Ann.loadSemDedupStateLive(spark, "sem_tk", s"$root/st", buckets = 4)
      assert(phys.where(col("doc_id") === 10L).count() == 1L)
      assert(live.where(col("doc_id") === 10L).count() == 0L)
      assert(ids(live.select("doc_id")) == Set(11L, 20L, 21L))
      // Compaction: fresh path only (in-place refused), tombstone debt
      // cleared, live content preserved; the monotone contract still
      // holds (physical max can only drop).
      intercept[IllegalArgumentException] {
        Ann.compactSemDedupState(spark, "sem_tk", s"$root/st", "sem_tk2", s"$root/st")
      }
      Ann.compactSemDedupState(spark, "sem_tk", s"$root/st", "sem_tk2", s"$root/st2",
        buckets = 4)
      val phys2 = Ann.loadSemDedupState(spark, "sem_tk2", s"$root/st2", buckets = 4)
      assert(ids(phys2.select("doc_id")) == Set(11L, 20L, 21L))
      assert(Ann.semDedupTombstones(spark, s"$root/st2").count() == 0L)
      // A dropped-but-live doc (21) still dominates later neighbors under
      // the one-pass chain contract, now over the compacted state.
      val got2 = ids(Ann.appendSemDedup(spark, "sem_tk2", s"$root/st2",
        embDf(40L -> at(44)), cents, tau, buckets = 4))
      assert(got2 == Set(40L), s"chain contract must survive compaction, got $got2")
    } finally {
      spark.sql("DROP TABLE IF EXISTS `sem_tk`")
      spark.sql("DROP TABLE IF EXISTS `sem_tk2`")
    }
  }

  test("Pipelines.semanticDedup auto-k end-to-end: deterministic, subset, near-dup-free") {
    val emb = embeddings.where(col("vec_id") < 120)
    val kept = graft.api.Pipelines.semanticDedup(emb, threshold = 0.44,
      targetCluster = 40, iters = 2)
    val ids = kept.collect().map(_.getLong(0)).toSet
    val again = graft.api.Pipelines.semanticDedup(emb, threshold = 0.44,
      targetCluster = 40, iters = 2).collect().map(_.getLong(0)).toSet
    assert(ids == again, "semanticDedup must be deterministic run-to-run")
    assert(ids.subsetOf(emb.collect().map(_.getLong(0)).toSet))
    assert(ids.nonEmpty)
    // Survivors contain no within-cluster tau-pair: re-running the prune
    // on the survivors with the SAME centroids is a fixpoint.
    val cents = Ann.kmeans(emb, Ann.semDedupKFor(emb.count(), 40), 2)
    val once = Ann.semDedup(emb, cents, 0.44)
    assert(Ann.semDedupDrops(once, cents, 0.44).count() == 0L,
      "prune must be idempotent under fixed centroids")
  }
}
