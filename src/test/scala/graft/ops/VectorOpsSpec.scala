package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Int8 quantization: 4× smaller vectors must stay rank-faithful. The
  * quantized cosine is a coarse-ranking tool — the contract is a bounded
  * absolute error and high top-k recall vs the exact float path, plus
  * ANSI-safe behavior on degenerate (all-zero) vectors. */
class VectorOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def emb = TestSpark.table("embeddings")

  test("codes are array<tinyint> — 4x fewer bytes than float32") {
    val q = emb.select(VectorOps.quantizeInt8(col("embedding")).as("q"))
    assert(q.schema("q").dataType == ArrayType(ByteType, containsNull = false) ||
      q.schema("q").dataType.asInstanceOf[ArrayType].elementType == ByteType)
  }

  test("quantized cosine is within 0.02 of the float cosine on all sample pairs") {
    val a = emb.where(col("vec_id") < 30)
      .select(col("vec_id").as("ida"), col("embedding").as("va"),
        VectorOps.quantizeInt8(col("embedding")).as("qa"))
    val b = emb.where(col("vec_id") >= 30 && col("vec_id") < 60)
      .select(col("vec_id").as("idb"), col("embedding").as("vb"),
        VectorOps.quantizeInt8(col("embedding")).as("qb"))
    val err = a.crossJoin(b)
      .select(abs(VectorOps.cosineInt8(col("qa"), col("qb")) -
        VectorOps.cosine(col("va"), col("vb"))).as("e"))
      .agg(max("e")).head().getDouble(0)
    assert(err < 0.02, s"max |quantized - exact| = $err")
  }

  test("top-10 recall of the quantized ranking vs exact is >= 0.9") {
    val probes = emb.where(col("vec_id") >= 490)
      .select(col("vec_id").as("probe"), col("embedding").as("p"),
        VectorOps.quantizeInt8(col("embedding")).as("qp"))
    val gallery = emb.where(col("vec_id") < 490)
      .select(col("vec_id").as("cand"), col("embedding").as("g"),
        VectorOps.quantizeInt8(col("embedding")).as("qg"))
    val joined = probes.crossJoin(gallery)
    def top10(scoreCol: org.apache.spark.sql.Column) = joined
      .select(col("probe"), col("cand"), scoreCol.as("s"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("probe")
          .orderBy(col("s").desc, col("cand"))))
      .where(col("rn") <= 10).select("probe", "cand")
    val exact = top10(VectorOps.cosine(col("p"), col("g")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = top10(VectorOps.cosineInt8(col("qp"), col("qg")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@10 = $recall")
  }

  test("Ann.topKQuantized agrees with exact float top-k at overfetch=4") {
    val probes = emb.where(col("vec_id") >= 490)
    val gallery = emb.where(col("vec_id") < 490)
    val exact = gallery
      .select(col("vec_id").as("g_id"), col("embedding").as("g_emb"))
      .crossJoin(probes.select(col("vec_id").as("p_id"), col("embedding").as("p_emb")))
      .select(col("p_id"), col("g_id"),
        VectorOps.cosine6(col("p_emb"), col("g_emb")).as("s"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("p_id")
          .orderBy(col("s").desc, col("g_id"))))
      .where(col("rn") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Ann.topKQuantized(probes, gallery, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(quant == exact)
  }

  test("empty vectors survive the LSH bucket path — no ANSI index error") {
    import spark.implicits._
    val emb = Seq((1L, Array(1f, 2f, 3f)), (2L, Array.empty[Float]),
        (3L, Array(1f, 2f, 3.1f)))
      .toDF("vec_id", "embedding")
    // sequence(1, 0) is descending [1, 0]: before the guard one empty
    // vector killed the whole near-dup job with INVALID_ARRAY_INDEX.
    val buckets = emb.select(Ann.hyperplaneBucket(col("embedding"), 4)).collect()
    assert(buckets.length == 3)
    val pairs = Ann.neardupLshAuto(emb, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 3L)))
  }

  test("zero-norm vectors rank LAST, never as nearest neighbors") {
    import spark.implicits._
    val gallery = Seq((1L, Array(1f, 0.1f)), (2L, Array(0f, 0f)))
      .toDF("vec_id", "embedding")
    val probes = Seq((10L, Array(1f, 0f))).toDF("vec_id", "embedding")
    // NaN sorts above every double in Spark: unguarded, the zero-norm row
    // wins every ranking. knn must return the genuinely similar vector.
    val nn = Ann.knn(probes, gallery).head()
    assert(nn.getLong(1) == 1L, s"zero-norm vector won the ranking: $nn")
    val topq = Ann.topKQuantized(probes, gallery, k = 1).head()
    assert(topq.getLong(1) == 1L, s"zero-norm vector won quantized ranking: $topq")
    val ivf = Ann.ivfAssign(probes, gallery).head()
    assert(ivf.getLong(1) == 1L, s"zero-norm centroid won assignment: $ivf")
  }

  test("topKQuantizedIvf: recall >= 0.9 on a clustered corpus (IVF's contract)") {
    import spark.implicits._
    // IVF's recall story assumes clustered data (real embedding corpora);
    // the fixture vectors are near-random, where ANY cell-restricted
    // search scatters — the fixture-side guarantee is the cell-restricted
    // exactness test below. Build 16 deterministic clusters; neighbors of
    // a probe live in its own cluster, so nprobe=2 must find them.
    val rnd = new scala.util.Random(7)
    val protos = Array.fill(16)(Array.fill(16)(rnd.nextGaussian().toFloat))
    def member(c: Int, noise: Double) =
      protos(c).map(x => (x + noise * rnd.nextGaussian()).toFloat)
    val gallery = (0 until 960).map(i => ((i + 100).toLong, member(i % 16, 0.08)))
      .toDF("vec_id", "embedding")
    val centroids = protos.zipWithIndex.toSeq.map { case (p, i) => (i.toLong, p) }
      .toDF("vec_id", "embedding")
    val probes = (0 until 24).map(i => ((i + 5000).toLong, member(i % 16, 0.08)))
      .toDF("vec_id", "embedding")
    val exact = gallery
      .select(col("vec_id").as("g_id"), col("embedding").as("g_emb"))
      .crossJoin(probes.select(col("vec_id").as("p_id"), col("embedding").as("p_emb")))
      .select(col("p_id"), col("g_id"),
        VectorOps.cosine6(col("p_emb"), col("g_emb")).as("s"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("p_id")
          .orderBy(col("s").desc, col("g_id"))))
      .where(col("rn") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fused = Ann.topKQuantizedIvf(probes, gallery, centroids, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(fused).size.toDouble / exact.size
    assert(recall >= 0.9, s"fused IVF+int8 recall@10 = $recall")
    // Every probe gets exactly k results.
    assert(fused.groupBy(_._1).forall(_._2.size == 10))
  }

  test("topKQuantizedIvf: exact within the probed cells on the fixture corpus") {
    // Unconditional guarantee on ANY corpus: the fused operator returns
    // EXACTLY the float top-k restricted to its probed cells — i.e. the
    // int8 coarse pass + re-rank loses nothing candidate generation kept
    // (the fixture twin of the clustered-recall test above).
    val probes = emb.where(col("vec_id") >= 490)
    val gallery = emb.where(col("vec_id") >= 8 && col("vec_id") < 490)
    val centroids = emb.where(col("vec_id") < 8)
    val cells = Ann.ivfAssign(gallery, centroids)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probeCells = probes
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
      .crossJoin(centroids.select(col("vec_id").as("cid"), col("embedding").as("c_emb")))
      .select(col("p_id"), col("cid"),
        VectorOps.cosine6(col("p_emb"), col("c_emb")).as("s"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("p_id")
          .orderBy(col("s").desc, col("cid"))))
      .where(col("rn") <= 2) // the operator's default nprobe
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exactInCells = gallery
      .select(col("vec_id").as("g_id"), col("embedding").as("g_emb"))
      .crossJoin(probes.select(col("vec_id").as("p_id"), col("embedding").as("p_emb")))
      .select(col("p_id"), col("g_id"),
        VectorOps.cosine6(col("p_emb"), col("g_emb")).as("s"))
      .collect()
      .filter(r => probeCells(r.getLong(0)).contains(cells(r.getLong(1))))
      .groupBy(_.getLong(0)).toSeq
      .flatMap { case (pid, rows) =>
        rows.sortBy(r => (-r.getDouble(2), r.getLong(1))).take(10)
          .map(r => (pid, r.getLong(1))).toSeq
      }.toSet
    val fused = Ann.topKQuantizedIvf(probes, gallery, centroids, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fused == exactInCells,
      s"fused != cell-restricted exact: extra=${fused -- exactInCells}, missing=${exactInCells -- fused}")

    // Steady state: a PERSISTED index (parquet round-trip) answers probe
    // batches identically — the build cost is paid once, not per batch.
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    Ann.ivfIndex(gallery, centroids).write.parquet(dir)
    val fromDisk = Ann.topKQuantizedIvfWithIndex(
        probes, spark.read.parquet(dir), gallery, centroids, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromDisk == fused)
  }

  test("kmeans recovers well-separated clusters and feeds the fused search") {
    import spark.implicits._
    // Three orthogonal-ish prototype directions, 60 members each, mild
    // noise: Lloyd's must put every member of a true cluster under the
    // same learned centroid.
    val rnd = new scala.util.Random(11)
    val protos = Array.fill(3)(Array.fill(16)(rnd.nextGaussian().toFloat * 3f))
    val vecs = (0 until 180).map { i =>
      (i.toLong, protos(i % 3).map(x => x + rnd.nextGaussian().toFloat * 0.1f))
    }.toDF("vec_id", "embedding")
    val centroids = Ann.kmeans(vecs, k = 3, iters = 5)
    assert(centroids.count() == 3)
    val assign = Ann.ivfAssign(vecs, centroids)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Purity: each true cluster maps to exactly one learned cid, and the
    // three cids are distinct.
    val byTrue = (0 until 3).map(c =>
      (0 until 180).filter(_ % 3 == c).map(i => assign(i.toLong)).distinct)
    assert(byTrue.forall(_.size == 1), s"mixed clusters: $byTrue")
    assert(byTrue.flatten.distinct.size == 3)
    // Learned centroids are usable by the fused search directly.
    val hits = Ann.topKQuantizedIvf(vecs.limit(5), vecs, centroids, k = 3)
    assert(hits.groupBy("p_id").count().collect().forall(_.getLong(1) == 3))
    // Determinism: training again yields the same centroids.
    val again = Ann.kmeans(vecs, k = 3, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val first = centroids.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(again == first)
  }

  test("kmeansWarm: converged centroids are a fixpoint; warm retrain absorbs drift and keeps cid identity") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // Exactly orthogonal block prototypes: cosine(pi, pj) = 0 for i ≠ j,
    // so the drift geometry below is known, not RNG-dependent.
    val protos = Array.tabulate(3)(c =>
      Array.tabulate(16)(d => if (d / 5 == c) 3f else 0f))
    // Interleaved ids (i % 3 = true cluster) so the deterministic seeds
    // (the k lowest ids) land one per true cluster.
    val vecs = (0 until 180).map { i =>
      (i.toLong, protos(i % 3).map(x => x + rnd.nextGaussian().toFloat * 0.1f))
    }.toDF("vec_id", "embedding")
    val converged = Ann.kmeans(vecs, k = 3, iters = 8).localCheckpoint()
    def cmap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // Fixpoint: one more warm iteration over the SAME corpus returns the
    // converged centroids unchanged (identical assignment -> identical
    // means).
    assert(cmap(Ann.kmeansWarm(vecs, converged, iters = 1)) == cmap(converged))
    // Drift: a new batch extends cluster 0 in a shifted direction. A warm
    // retrain moves centroid ids 0..2 (identity preserved — no
    // re-seeding) and re-purifies the assignment of the grown corpus.
    // A small ANGULAR nudge toward proto 1 (cos to proto0 ≈ 0.96, to
    // proto1 ≈ 0.3): still inside cluster 0's cosine cell, but enough
    // mass to move the centroid direction under the warm retrain.
    val shifted = protos(0).zip(protos(1)).map { case (a, b) => a + 0.3f * b }
    val extra = (0 until 40).map { i =>
      (300L + i, shifted.map(x => x + rnd.nextGaussian().toFloat * 0.1f))
    }.toDF("vec_id", "embedding")
    val grown = vecs.unionByName(extra)
    val warm = Ann.kmeansWarm(grown, converged, iters = 4).localCheckpoint()
    assert(cmap(warm).keySet == cmap(converged).keySet,
      "warm retrain must preserve centroid identity (no re-seeding)")
    val assign = Ann.ivfAssign(grown, warm)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Old cluster-0 members and the drifted batch share one centroid;
    // clusters 1/2 stay pure and distinct.
    val c0 = (0 until 180 by 3).map(i => assign(i.toLong)).distinct
    val cx = (0 until 40).map(i => assign(300L + i)).distinct
    assert(c0.size == 1 && cx == c0, s"drifted batch split from its cluster: $c0 vs $cx")
    val c1 = (1 until 180 by 3).map(i => assign(i.toLong)).distinct
    val c2 = (2 until 180 by 3).map(i => assign(i.toLong)).distinct
    assert(c1.size == 1 && c2.size == 1 && Set(c0.head, c1.head, c2.head).size == 3)
  }

  test("kmeans: k above the distinct-point count keeps stale centroids, no collapse") {
    import spark.implicits._
    val one = Array.fill(8)(1f)
    val two = Array.fill(8)(-1f)
    val vecs = Seq((0L, one), (1L, one), (2L, two)).toDF("vec_id", "embedding")
    val cents = Ann.kmeans(vecs, k = 5, iters = 3)
    // Only 3 seed vectors exist -> 3 centroids seeded; the two clusters
    // that lose members to identical twins persist via the stale branch.
    assert(cents.count() == 3)
    assert(Ann.ivfAssign(vecs, cents).count() == 3)
  }

  test("brute-force audit guards fire above their size bounds") {
    import spark.implicits._
    val vecs = (1L to 6L).map(i => (i, Array(i.toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val eKnn = intercept[IllegalArgumentException] {
      Ann.knn(vecs, vecs, maxPairs = 35)
    }
    assert(eKnn.getMessage.contains("topKQuantizedIvf") ||
      eKnn.getMessage.contains("IVF"))
    val eAll = intercept[IllegalArgumentException] {
      Ann.allPairsCosine(vecs, 0.9, maxVectors = 5)
    }
    assert(eAll.getMessage.contains("neardupLshAuto"))
    // At or under the bound both audit forms execute.
    assert(Ann.knn(vecs, vecs, maxPairs = 36).count() == 6)
    assert(Ann.allPairsCosine(vecs, -1.0, maxVectors = 6).count() == 15)
  }

  test("knn/ivfAssign work with NON-numeric ids (tie-break never negates the id)") {
    import spark.implicits._
    // Two gallery rows with IDENTICAL vectors force a score tie: the
    // arg-min key must break it to the lexicographically smallest id
    // without negating (string ids cannot be negated; Long.MinValue
    // errors under ANSI).
    val gallery = Seq(("doc-b", Array(1f, 0f)), ("doc-a", Array(1f, 0f)),
        ("doc-c", Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val probes = Seq(("p1", Array(1f, 0.01f))).toDF("vec_id", "embedding")
    val nn = Ann.knn(probes, gallery).head()
    assert(nn.getString(1) == "doc-a", s"tie not broken to smallest id: $nn")
    val asg = Ann.ivfAssign(probes, gallery).head()
    assert(asg.getString(1) == "doc-a", s"assignment tie not smallest id: $asg")
  }

  test("duplicate centroid ids throw at operator build; snapshot is build-time") {
    import spark.implicits._
    val vecs = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val dupCents = Seq((7L, Array(1f, 0f)), (7L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    // Ambiguous centroid identity must fail AT BUILD TIME (the eager
    // bounded collect), not assign arbitrarily.
    val e = intercept[IllegalArgumentException] {
      Ann.ivfAssign(vecs, dupCents)
    }
    assert(e.getMessage.contains("duplicate centroid ids"), e.getMessage)
    // Eager-snapshot semantics: the plan built against a centroid view
    // keeps serving the snapshot after the source mutates.
    val src = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    src.createOrReplaceTempView("__cent_snap")
    val assigned = Ann.ivfAssign(vecs, spark.table("__cent_snap"))
    Seq((99L, Array(0f, 1f))).toDF("vec_id", "embedding")
      .createOrReplaceTempView("__cent_snap")
    // Both vectors still assign to the snapshotted centroid 1, not 99.
    assert(assigned.select("cid").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("all-zero vectors quantize to zero codes and NaN cosine — no ANSI divide error") {
    import spark.implicits._
    val z = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, 2f, 3f)))
      .toDF("id", "embedding")
    val rows = z.select(col("id"),
        VectorOps.quantizeInt8(col("embedding")).as("q"))
      .withColumn("sim", VectorOps.cosineInt8(col("q"), col("q")))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Byte](1).forall(_ == 0))
    assert(rows(0).getDouble(2).isNaN)
    assert(math.abs(rows(1).getDouble(2) - 1.0) < 1e-9)
  }

  test("appendIvfIndex: appended index ≡ fresh build; drift report arithmetic; dup-id guard") {
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val centroids = emb.where(col("vec_id") < 8)
    val galA = emb.where(col("vec_id") >= 8 && col("vec_id") <= maxId - 50)
    val galB = emb.where(col("vec_id") > maxId - 50)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-append").toString + "/idx"
    Ann.persistIvfIndex(Ann.ivfIndex(galA, centroids), "ivf_app_w", dir, buckets = 4)
    try {
      val drift = Ann.appendIvfIndex(spark, "ivf_app_w", dir, galB, centroids,
        buckets = 4).collect()
      // The report accounts for every prior and appended row, growth is a
      // proper fraction, and assignment similarity is a valid cosine.
      assert(drift.map(_.getLong(1)).sum == galA.count())
      assert(drift.map(_.getLong(2)).sum == galB.count())
      assert(drift.filter(_.getLong(2) > 0).forall { r =>
        val g = r.getDouble(3); g > 0 && g <= 1.0 &&
          math.abs(r.getDouble(4)) <= 1.0
      })
      // Appended table content equals a one-shot build over the union
      // gallery under the same frozen centroids.
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Byte](2).toSeq))
        .sortBy(_._1).toSeq
      val appended = canon(spark.table("ivf_app_w"))
      val fresh = canon(Ann.ivfIndex(galA.unionByName(galB), centroids))
      assert(appended == fresh && appended.nonEmpty)
      // Re-appending the same ids must refuse (silent duplicates would
      // break the ≡-fresh-build contract).
      intercept[IllegalArgumentException] {
        Ann.appendIvfIndex(spark, "ivf_app_w", dir, galB, centroids, buckets = 4)
      }
    } finally spark.sql("DROP TABLE IF EXISTS `ivf_app_w`")
  }

  test("deleteFromIvfIndex: tombstones hide rows from search; compaction clears the debt") {
    val spark2 = spark
    import spark2.implicits._
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val centroids = emb.where(col("vec_id") < 8)
    val gallery = emb.where(col("vec_id") >= 8 && col("vec_id") <= maxId - 100)
    val probes = emb.where(col("vec_id") > maxId - 100)
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivf-del").toString
    val dir = s"$root/idx"
    Ann.persistIvfIndex(Ann.ivfIndex(gallery, centroids), "ivf_del_w", dir, buckets = 4)
    try {
      // Delete the CURRENT top hit of some probe so the takedown is
      // observable in search results, plus one never-indexed id.
      val before = Ann.topKQuantizedIvfWithIndex(probes,
        Ann.loadIvfIndexLive(spark, "ivf_del_w", dir, buckets = 4),
        gallery, centroids, k = 5).localCheckpoint()
      val victim = before.orderBy(col("p_id"), col("rn")).head().getLong(1)
      val live = Ann.deleteFromIvfIndex(spark, "ivf_del_w", dir,
        Seq(victim, 999999999L).toDF("vec_id"), buckets = 4)
      assert(live == 1L, "exactly the indexed id counts as a live deletion")
      // Search over the LIVE view never returns the victim; other
      // galleries rows still rank (k results per probe where available).
      val after = Ann.topKQuantizedIvfWithIndex(probes,
        Ann.loadIvfIndexLive(spark, "ivf_del_w", dir, buckets = 4),
        gallery, centroids, k = 5)
      assert(after.where(col("g_id") === victim).isEmpty,
        "a tombstoned vector must stop being retrievable")
      assert(after.count() > 0)
      // Idempotent re-delete: no live rows remain for the id.
      assert(Ann.deleteFromIvfIndex(spark, "ivf_del_w", dir,
        Seq(victim).toDF("vec_id"), buckets = 4) == 0L)
      // Re-appending a tombstoned id refuses with the compaction hint
      // (physical guard — the live filter would kill BOTH copies).
      val eDup = intercept[IllegalArgumentException] {
        Ann.appendIvfIndex(spark, "ivf_del_w", dir,
          gallery.where(col("vec_id") === victim), centroids, buckets = 4)
      }
      assert(eDup.getMessage.contains("compactIvfIndex"))
      // Compaction: fresh path holds exactly the live rows, no
      // tombstones, and the victim's id is appendable again.
      val compacted = Ann.compactIvfIndex(spark, "ivf_del_w", dir,
        "ivf_del_w2", s"$root/idx2", buckets = 4)
      assert(compacted.where(col("g_id") === victim).isEmpty)
      assert(compacted.count() == gallery.count() - 1)
      assert(Ann.ivfTombstones(spark, s"$root/idx2").isEmpty)
      val drift = Ann.appendIvfIndex(spark, "ivf_del_w2", s"$root/idx2",
        gallery.where(col("vec_id") === victim), centroids, buckets = 4)
      assert(drift.agg(sum(col("appended_n"))).head().getLong(0) == 1L)
      // In-place compaction refused.
      intercept[IllegalArgumentException] {
        Ann.compactIvfIndex(spark, "ivf_del_w2", s"$root/idx2",
          "ivf_del_w3", s"$root/idx2", buckets = 4)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS `ivf_del_w`")
      spark.sql("DROP TABLE IF EXISTS `ivf_del_w2`")
      spark.sql("DROP TABLE IF EXISTS `ivf_del_w3`")
    }
  }

  test("marginMine: ratio margin mines aligned pairs, suppresses the middle, honors mutual + guards") {
    import spark.implicits._
    def at(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    // Two aligned pairs at 3 deg separation plus a "middle" vector at 45
    // deg that is close-ish to BOTH xs — raw cosine would still rank it
    // second everywhere; the margin keeps it from forming any pair.
    val xs = Seq(1L -> at(0), 2L -> at(90)).toDF("vec_id", "embedding")
    val ys = Seq(11L -> at(3), 12L -> at(87), 13L -> at(45))
      .toDF("vec_id", "embedding")
    val got = Ann.marginMine(xs, ys, kNorm = 2, threshold = 1.05)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2)).toSet == Set((1L, 11L), (2L, 12L)),
      s"aligned pairs expected, got ${got.toSeq}")
    assert(got.forall(_._3 > 1.4), s"aligned margins should stand out: ${got.toSeq}")
    // Hand arithmetic pin for (1, 11): s = cos 3; ax = (cos3 + cos45)/2,
    // ay = (cos3 + cos87)/2; margin = s / ((ax + ay)/2).
    val (c3, c45, c87) = (0.99863, 0.707107, 0.052336)
    val expect = c3 / (((c3 + c45) / 2 + (c3 + c87) / 2) / 2)
    val m11 = got.find(t => t._1 == 1L).get._3
    assert(math.abs(m11 - expect) < 1e-4, s"margin $m11 vs hand $expect")
    // A high threshold empties the result; mutual=false keeps per-x
    // bests independently of the other side.
    assert(Ann.marginMine(xs, ys, kNorm = 2, threshold = 1.5).count() == 0L)
    assert(Ann.marginMine(xs, ys, kNorm = 2, threshold = 1.05, mutual = false)
      .count() == 2L)
    // Zero-norm vectors never mine (NaN cosine fails every threshold).
    val xz = Seq(3L -> Seq(0f, 0f)).toDF("vec_id", "embedding")
    assert(Ann.marginMine(xz, ys, kNorm = 2, threshold = 0.1).count() == 0L)
    // The block guard fires loudly past maxPairs.
    intercept[IllegalArgumentException] {
      Ann.marginMine(xs, ys, kNorm = 2, maxPairs = 3L)
    }
  }

  test("marginMineBlocked: one cell ≡ exact form; cells keep the plan keyed; cross-cell is the trade") {
    import spark.implicits._
    def at(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val xs = Seq(1L -> at(0), 2L -> at(90)).toDF("vec_id", "embedding")
    val ys = Seq(11L -> at(3), 12L -> at(87), 13L -> at(45))
      .toDF("vec_id", "embedding")
    // One cell holding everything: blocked ≡ exact, value for value.
    val oneCell = Seq(0L -> at(45)).toDF("vec_id", "embedding")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).sortBy(_._1).toSeq
    assert(canon(Ann.marginMineBlocked(xs, ys, oneCell, kNorm = 2, threshold = 1.05)) ==
      canon(Ann.marginMine(xs, ys, kNorm = 2, threshold = 1.05)))
    // Two cells at 0 and 90 deg, each holding a real neighborhood (a
    // cell with a single candidate degenerates the margin to exactly 1 —
    // the scaladoc's "cells comfortably larger than kNorm" rule): the
    // aligned pairs stand out of their cell-local neighborhoods; the
    // 45-deg middle tie-breaks into cell 0 and never forms a pair.
    val cells = Seq(0L -> at(0), 1L -> at(90)).toDF("vec_id", "embedding")
    val ys2 = Seq(11L -> at(3), 13L -> at(30), 12L -> at(87), 14L -> at(60),
      15L -> at(45)).toDF("vec_id", "embedding")
    val blocked = Ann.marginMineBlocked(xs, ys2, cells, kNorm = 2, threshold = 1.03)
    assert(blocked.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 11L), (2L, 12L)))
    // Plan: candidates come from an equi join on the cell id — never a
    // cartesian xs × ys.
    val plan = blocked.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"blocked mining must stay keyed:\n$plan")
  }
}
