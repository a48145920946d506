package graft.api

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{DedupOps, MultiModal}

/** The whole training-data pipeline, composed: quality filter → linear
  * dedup decision → fingerprints → (stub) feature extraction → sink.
  * One logical graph; asserts the stage contracts hold end to end. */
class EndToEndPipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("filter → dedup → fingerprint → featurize → sink composes and conserves rows") {
    val docs = TestSpark.table("documents")

    // 1. Quality + language filter.
    val kept = Pipelines.qualityFilter(docs, col("doc_id"), col("text"))
    val keptN = kept.count()
    assert(keptN > 0 && keptN <= docs.count())

    // 2. Linear dedup decision over the kept docs.
    val toks = DedupOps.tokenSet(kept, col("doc_id"), col("text"))
    val unique = DedupOps.minhashDedupKeep(toks, 8)
      .where(!col("is_dup")).select("doc_id")
    val uniqueN = unique.count()
    assert(uniqueN > 0 && uniqueN <= keptN)

    // 3. Fingerprints for the surviving docs (incremental-dedup handle).
    val surviving = docs.join(unique, "doc_id")
    val fp = Pipelines.fingerprints(surviving, col("doc_id"), col("text"))
    assert(fp.count() == uniqueN)

    // 4. Stub featurization of the surviving docs as binary assets.
    val features = MultiModal.stubDecodeFeatures(
      MultiModal.assetsFromDocuments(surviving), dims = 16)
    assert(features.count() == uniqueN)

    // 5. Sink + read-back.
    val out = java.nio.file.Files.createTempDirectory("graft-e2e").toString + "/features"
    features.write.parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == uniqueN)
    assert(back.schema.fieldNames.toSeq == Seq("asset_id", "features"))
  }

  test("cross-run incremental dedup equals the from-scratch union dedup") {
    val docs = TestSpark.table("documents")
    val run1 = docs.where(col("doc_id") % 2 === 0)
    val run2 = docs.where(col("doc_id") % 2 === 1)

    // Run 1 persists its dedup state (the only artifact run 2 may read).
    val stateDir = java.nio.file.Files.createTempDirectory("graft-incdedup")
      .toString + "/state"
    Pipelines.dedupState(run1, col("doc_id"), col("text")).write.parquet(stateDir)

    // Run 2 dedups its batch against the persisted state alone.
    val prior = spark.read.parquet(stateDir)
    val inc = Pipelines.dedupAgainst(run2, col("doc_id"), col("text"), prior)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

    // Ground truth: from-scratch dedup over run1 ∪ run2, restricted to run2.
    val run2Ids = run2.select("doc_id").collect().map(_.getLong(0)).toSet
    val scratch = Pipelines.dedupDecision(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .filter(kv => run2Ids.contains(kv._1)).toMap
    assert(inc == scratch && inc.nonEmpty)

    // Absorbing the batch converges the state to the from-scratch table,
    // and re-absorbing the same batch is idempotent.
    val updated = DedupOps.updatedFingerprints(prior, run2, col("doc_id"), col("text"))
    val full = DedupOps.fingerprintTable(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(updated.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == full)
    val again = DedupOps.updatedFingerprints(updated, run2, col("doc_id"), col("text"))
    assert(again.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == full)
  }

  test("curate → data card → searchable index composes (the round-13 tail of the funnel)") {
    val docs = TestSpark.table("documents")
    // 1. Curate (defaults) — the funnel's clean pool.
    val res = Pipelines.curate(docs)
    val clean = res.curated.localCheckpoint()
    val n = clean.count()
    assert(n > 0 && n < docs.count())
    // 2. Data card over the clean pool: volume section must agree with
    // the pool itself, and the card's doc count with the funnel audit.
    val card = Pipelines.corpusReport(clean, sourceCol = Some("source"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(card(("volume", "docs")) == n.toDouble)
    val audit = res.audit.collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(card(("volume", "docs")) == audit("mixed").toDouble)
    // 3. The clean pool becomes a searchable artifact: persisted BM25
    // index whose ranking equals the ad-hoc ranker over the SAME pool.
    val root = java.nio.file.Files.createTempDirectory("graft-e2e-bm25").toString
    try {
      graft.ops.SketchOps.persistBm25Index(
        graft.ops.SketchOps.buildBm25Index(clean, col("doc_id"), col("text")),
        "e2e_bm25", s"$root/idx", buckets = 4)
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val indexed = graft.ops.SketchOps.bm25QueryIndexed(spark, "e2e_bm25",
        s"$root/idx", Seq("data", "stream"), buckets = 4)
        .collect().map(r => r.getLong(0) -> r6(r.getDouble(1))).toMap
      val adHoc = Pipelines.bm25Rank(clean, col("doc_id"), col("text"),
        Seq("data", "stream"))
        .collect().map(r => r.getLong(0) -> r6(r.getDouble(1))).toMap
      assert(indexed == adHoc && indexed.nonEmpty)
      // Every ranked doc survived curation (the index serves the pool).
      val keptIds = clean.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(indexed.keySet.subsetOf(keptIds))
    } finally {
      spark.sql("DROP TABLE IF EXISTS `e2e_bm25_po`")
      spark.sql("DROP TABLE IF EXISTS `e2e_bm25_dl`")
    }
  }

  test("fully-gated funnel: HITS authority + calibrated classifier + fuzzy decontamination in one curate") {
    val spark2 = spark
    import spark2.implicits._
    val real = TestSpark.table("documents").limit(300)
    // Heuristic-passing gibberish (the LinearClassifierSpec fixture):
    // the calibrated gate's targets.
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val junk = TestSpark.table("documents").limit(300)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", (1 to 30).flatMap(i => Seq(
          lit(stop(i % stop.size)),
          substring(md5(concat(col("text"), lit(i))), 1, 7))): _*).as("text"))
    // 1. Web graph: farms endorse the hub; hostHits authority gates the
    //    funnel (farm docs die, unknown hosts keep).
    val links = (1 to 20).map(i =>
      (s"https://farm$i.spam/p", "https://hub.org/")).toDF("src_url", "dst_url")
    val hh = Pipelines.hostHits(links, col("src_url"), col("dst_url"),
      iterations = 3).localCheckpoint()
    // 2. Calibrated classifier: train on one side of the split,
    //    calibrate the floor at target precision on the other.
    val labeled = real.select(col("doc_id"), col("text"), lit(1.0).as("y"))
      .unionByName(junk.select(col("doc_id"), col("text"), lit(0.0).as("y")))
      .withColumn("bucket",
        Pipelines.splitWeighted("doc_id", Seq("train" -> 0.7, "heldout" -> 0.3)))
    val model = graft.ops.LinearClassifier.train(
      labeled.where(col("bucket") === "train"), col("text"), col("y"),
      dim = 1 << 15, iters = 25)
    val cal = graft.ops.LinearClassifier.calibrateFloor(
      labeled.where(col("bucket") === "heldout").localCheckpoint(),
      col("text"), col("y"), model, targetPrecision = 0.9)
    // 3. Eval set with a paraphrased (word-reversed) leak planted in the
    //    corpus — only the fuzzy gate can see it.
    val evalRow = real.orderBy("doc_id").limit(1)
      .select(col("text")).head().getString(0)
    val leak = Seq((2000000L, evalRow.split(" ").reverse.mkString(" ")))
      .toDF("doc_id", "text")
    val docs = real.select("doc_id", "text").unionByName(junk).unionByName(leak)
      .withColumn("source", lit("s0"))
      .withColumn("url",
        when(col("doc_id") % 3 === 0,
          concat(lit("https://farm"), (col("doc_id") % 20 + 1).cast("string"),
            lit(".spam/d/"), col("doc_id")))
          .otherwise(concat(lit("https://fresh.example/d/"), col("doc_id"))))
    val res = Pipelines.curate(docs,
      evalSet = Some(Seq(Tuple1(evalRow)).toDF("text")),
      fuzzyEval = Some(0.8),
      classifierCalibration = Some(cal),
      hostAuthorityGate = Some(Pipelines.HostAuthorityGate(
        hh, floor = 0.01, url = col("url"), scoreCol = col("auth"))))
    val kept = res.curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty)
    assert(!kept.exists(id => id % 3 == 0),
      "zero-authority farm-host docs must die in the HITS gate")
    // The calibrated floor is the most-recall point inside the precision
    // budget, so a few borderline junk rows may clear it (the same ≤10
    // tolerance the fixed-floor spec uses on this fixture).
    assert(kept.count(id => id >= 1000000L && id < 2000000L) <= 10,
      s"gibberish survived the calibrated gate: ${kept.count(_ >= 1000000L)}")
    assert(!kept.contains(2000000L),
      "the paraphrased eval leak must die in the fuzzy decontamination")
    // The audit tells the whole story in order, with the calibration's
    // operating point recorded.
    val names = res.audit.collect().map(_.getString(1)).toSeq
    assert(names.indexOf("host_authority") < names.indexOf("classifier") &&
      names.indexOf("classifier") < names.indexOf("decontaminated"), names.toString)
    val detail = res.audit.where(col("stage") === "classifier")
      .head().getString(3)
    assert(detail != null && detail.contains("target_precision=0.90"), detail)
  }
}
