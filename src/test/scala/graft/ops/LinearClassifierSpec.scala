package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class ClsDoc(doc_id: Long, text: String)

/** The learned quality gate must separate reference-like text from
  * gibberish that PASSES the scalar heuristics, score deterministically
  * under a fixed model, round-trip its persisted form, and degrade
  * (never throw) on null/empty text. */
class LinearClassifierSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def real = TestSpark.table("documents").limit(300)

  // Word-shaped gibberish (the StreamLm fixture trick): md5 fragments
  // with stopwords sprinkled so heuristic quality/lang gates pass.
  private def junk = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    TestSpark.table("documents").limit(300)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", (1 to 30).flatMap(i => Seq(
          lit(stop(i % stop.size)),
          substring(md5(concat(col("text"), lit(i))), 1, 7))): _*).as("text"))
  }

  test("train + score: separates reference text from heuristic-passing gibberish") {
    val spark2 = spark
    import spark2.implicits._
    val model = graft.api.Pipelines.trainQualityClassifier(
      real.select("text"), junk.select("text"), col("text"),
      dim = 1 << 15, iters = 30)

    // Held-out-ish shape: score the SAME distributions (the spec pins
    // separation, not generalization — fixture vocabularies barely
    // overlap, which is exactly the production regime for this filter).
    val posScores = graft.ops.LinearClassifier
      .score(real, col("doc_id"), col("text"), model)
      .agg(avg("score"), min("score")).head()
    val negScores = graft.ops.LinearClassifier
      .score(junk, col("doc_id"), col("text"), model)
      .agg(avg("score"), max("score")).head()
    assert(posScores.getDouble(0) > 0.8,
      s"mean positive score too low: ${posScores.getDouble(0)}")
    assert(negScores.getDouble(0) < 0.2,
      s"mean negative score too high: ${negScores.getDouble(0)}")

    // Accuracy at the 0.5 cut.
    val pn = graft.ops.LinearClassifier.score(real, col("doc_id"), col("text"), model)
      .where(col("score") >= 0.5).count()
    val nn = graft.ops.LinearClassifier.score(junk, col("doc_id"), col("text"), model)
      .where(col("score") < 0.5).count()
    assert(pn >= 290 && nn >= 290, s"accuracy too low: pos $pn/300, neg $nn/300")

    // Scoring under a FIXED model is layout-independent and deterministic.
    val s1 = graft.ops.LinearClassifier.score(real, col("doc_id"), col("text"), model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s2 = graft.ops.LinearClassifier
      .score(real.repartition(7), col("doc_id"), col("text"), model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s1 == s2)

    // Persisted round trip is bit-exact; the filter facade gates whole rows.
    val back = LinearClassifier.Model.fromBytes(model.toBytes)
    assert(back.bias == model.bias &&
      java.util.Arrays.equals(back.weights, model.weights))
    val mixed = real.select("doc_id", "text").unionByName(junk)
    val kept = graft.api.Pipelines.classifierFilter(
      mixed, col("doc_id"), col("text"), back, floor = 0.5)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    val ids = kept.select("doc_id").collect().map(_.getLong(0))
    assert(ids.count(_ < 1000000L) >= 290 && ids.count(_ >= 1000000L) <= 10)

    // Funnel integration: the learned gate drops heuristic-passing junk
    // at its own audited stage.
    val full = real.select("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .unionByName(junk.withColumn("lang", lit("en")).withColumn("source", lit("s0")))
    val res = graft.api.Pipelines.curate(full,
      classifierFloor = Some((model, 0.5)))
    val names = res.audit.collect().map(_.getString(1)).toSeq
    assert(names.contains("classifier"), s"classifier stage must audit: $names")
    val curatedIds = res.curated.select("doc_id").collect().map(_.getLong(0))
    assert(curatedIds.count(_ >= 1000000L) <= 10,
      "heuristic-passing gibberish must die at the learned gate")
    assert(!graft.api.Pipelines.curate(full).audit.collect()
      .map(_.getString(1)).contains("classifier"),
      "no classifier row unless the gate runs")

    // Degrades: null/empty text scores at the prior, never throws.
    val edge = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val es = graft.ops.LinearClassifier.score(edge, col("doc_id"), col("text"), model)
      .collect().map(_.getDouble(1))
    assert(es.length == 3 && es.forall(s => s > 0.0 && s < 1.0))
    assert(es.distinct.length == 1, "featureless rows all score at the prior")
  }

  test("evaluate: held-out threshold curve carries the floor-choice evidence") {
    val spark2 = spark
    import spark2.implicits._
    // The production calibration recipe verbatim: label the fixture,
    // carve a held-out slice with the deterministic weighted split,
    // train on the rest, evaluate the curve on the slice.
    val labeled = real.select(col("doc_id"), col("text"), lit(1.0).as("y"))
      .unionByName(junk.select(col("doc_id"), col("text"), lit(0.0).as("y")))
      .withColumn("bucket", graft.api.Pipelines.splitWeighted(
        "doc_id", Seq("train" -> 0.7, "heldout" -> 0.3)))
    val train = labeled.where(col("bucket") === "train")
    val heldout = labeled.where(col("bucket") === "heldout").localCheckpoint()
    val model = LinearClassifier.train(train, col("text"), col("y"),
      dim = 1 << 15, iters = 30)
    val grid = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
    val curve = LinearClassifier.evaluate(
      heldout, col("text"), col("y"), model, grid).collect()
    assert(curve.map(_.getDouble(0)).toSeq == grid, "one row per threshold, ordered")
    val nPos = heldout.where(col("y") === 1.0).count()
    val nHeld = heldout.count()
    curve.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) == nHeld,
        "confusion matrix must partition the held-out slice")
      assert(r.getLong(1) + r.getLong(4) == nPos, "tp+fn = actual positives")
    }
    // Known separability: every cut on this fixture is nearly clean.
    val at05 = curve.find(_.getDouble(0) == 0.5).get
    assert(at05.getDouble(7) >= 0.95, s"accuracy at 0.5: ${at05.getDouble(7)}")
    assert(at05.getDouble(5) >= 0.95 && at05.getDouble(6) >= 0.95,
      "precision and recall at 0.5 must both be high on a separable fixture")
    // Monotone structure of any threshold sweep: predicted positives
    // (tp+fp) never increase as the threshold rises; recall never rises.
    val predPos = curve.map(r => r.getLong(1) + r.getLong(2)).toSeq
    assert(predPos == predPos.sorted.reverse, s"tp+fp not non-increasing: $predPos")
    val recalls = curve.map(_.getDouble(6)).toSeq
    assert(recalls == recalls.sorted.reverse, s"recall not non-increasing: $recalls")
    // Degenerate-denominator honesty: a threshold above every score
    // yields zero predicted positives and a NULL precision (not 0/1).
    val top = LinearClassifier.evaluate(
      heldout, col("text"), col("y"), model, Seq(1.0)).head()
    assert(top.getLong(1) == 0L && top.getLong(2) == 0L && top.isNullAt(5))
    // Ill-labeled rows are ignored, not miscounted.
    val noisy = heldout.unionByName(
      Seq((9999999L, "stray", 0.5)).toDF("doc_id", "text", "y")
        .withColumn("bucket", lit("heldout")))
    assert(LinearClassifier.evaluate(noisy, col("text"), col("y"), model, Seq(0.5))
      .head().getLong(1) == at05.getLong(1))
  }

  test("calibrateFloor picks the most-recall threshold inside the precision budget; curate audits it") {
    val spark2 = spark
    import spark2.implicits._
    // The production recipe end to end: label, split, train on one side,
    // CALIBRATE on the other, run the funnel off the calibration.
    val labeled = real.select(col("doc_id"), col("text"), lit(1.0).as("y"))
      .unionByName(junk.select(col("doc_id"), col("text"), lit(0.0).as("y")))
      .withColumn("bucket", graft.api.Pipelines.splitWeighted(
        "doc_id", Seq("train" -> 0.7, "heldout" -> 0.3)))
    val train = labeled.where(col("bucket") === "train")
    val heldout = labeled.where(col("bucket") === "heldout").localCheckpoint()
    val model = LinearClassifier.train(train, col("text"), col("y"),
      dim = 1 << 15, iters = 30)
    val grid = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
    val cal = LinearClassifier.calibrateFloor(
      heldout, col("text"), col("y"), model, targetPrecision = 0.95, grid)
    assert(cal.precision >= 0.95, s"chosen floor misses the target: $cal")
    assert(grid.contains(cal.floor))
    // LOWEST qualifying threshold — no lower grid point reaches the
    // target (most recall inside the precision budget).
    val curve = LinearClassifier.evaluate(
        heldout, col("text"), col("y"), model, grid).collect()
      .map(r => r.getDouble(0) ->
        (if (r.isNullAt(5)) Double.NaN else r.getDouble(5))).toMap
    assert(grid.filter(_ < cal.floor).forall(t => !(curve(t) >= 0.95)),
      s"a lower threshold also qualified: $curve vs ${cal.floor}")
    // Separable fixture: the budget is met without giving up recall.
    assert(cal.recall >= 0.9, s"recall collapsed at the chosen floor: $cal")

    // curate consumes the calibration: junk dies at the audited stage
    // and the audit's detail column records the operating point.
    val full = real.select("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .unionByName(junk.withColumn("lang", lit("en")).withColumn("source", lit("s0")))
    val res = graft.api.Pipelines.curate(full, classifierCalibration = Some(cal))
    val audit = res.audit.collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getString(3))).toMap
    assert(audit.contains("classifier"))
    val detail = audit("classifier")._2
    assert(detail != null &&
      detail.contains(String.format(java.util.Locale.ROOT, "floor=%.2f",
        Double.box(cal.floor))) &&
      detail.contains("target_precision=0.95"),
      s"audit detail must record the calibration: $detail")
    assert(audit.filter(_._1 != "classifier").values.forall(_._2 == null),
      "only the calibrated stage carries a detail")
    val curatedIds = res.curated.select("doc_id").collect().map(_.getLong(0))
    assert(curatedIds.count(_ >= 1000000L) <= 10,
      "gibberish must die at the calibrated gate")

    // Hygiene: both gate params refuse; an unreachable target refuses
    // loudly (a featureless model scores everything at the prior — no
    // threshold can reach 0.95 precision on a balanced slice).
    intercept[IllegalArgumentException] {
      graft.api.Pipelines.curate(full, classifierFloor = Some((model, 0.5)),
        classifierCalibration = Some(cal))
    }
    val flat = LinearClassifier.Model(
      new Array[Float](model.dim), 0.0f)
    val e = intercept[IllegalArgumentException] {
      LinearClassifier.calibrateFloor(
        heldout, col("text"), col("y"), flat, targetPrecision = 0.95, grid)
    }
    assert(e.getMessage.contains("no grid threshold"))
  }

  test("warm start continues the descent; streamed gate ≡ batch, stateless") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val dim = 1 << 14
    val m0 = graft.api.Pipelines.trainQualityClassifier(
      real.select("text"), junk.select("text"), col("text"),
      dim = dim, iters = 20)
    // Warm start: a few extra rounds from the converged weights must
    // keep (not destroy) the separation — and dim mismatches refuse.
    val labeled = real.select(col("text").as("t"), lit(1.0).as("y"))
      .unionByName(junk.select(col("text").as("t"), lit(0.0).as("y")))
    val m1 = LinearClassifier.train(labeled, col("t"), col("y"),
      dim = dim, iters = 3, init = Some(m0))
    val acc = LinearClassifier.score(real, col("doc_id"), col("text"), m1)
      .where(col("score") >= 0.5).count() +
      LinearClassifier.score(junk, col("doc_id"), col("text"), m1)
        .where(col("score") < 0.5).count()
    assert(acc >= 580, s"warm-started model lost separation: $acc/600")
    intercept[IllegalArgumentException] {
      LinearClassifier.train(labeled, col("t"), col("y"),
        dim = dim / 2, iters = 1, init = Some(m0))
    }

    // Streamed gate: identical survivors to the batch filter, schema
    // untouched, zero state operators.
    val rows = real.select("doc_id", "text").unionByName(junk)
      .collect().map(r => ClsDoc(r.getLong(0), r.getString(1)))
    val batchKept = LinearClassifier
      .filterByScore(rows.toSeq.toDF(), col("text"), m1, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val mem = MemoryStream[ClsDoc]
    val q = LinearClassifier.filterByScore(mem.toDF(), col("text"), m1, 0.5)
      .writeStream.format("memory").queryName("t_cls").outputMode("append").start()
    try {
      rows.grouped(200).foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
      val streamed = spark.table("t_cls")
      assert(streamed.columns.toSeq == Seq("doc_id", "text"))
      assert(streamed.select("doc_id").collect().map(_.getLong(0)).toSet == batchKept)
      val plan = q.lastProgress
      assert(plan == null || plan.stateOperators.isEmpty,
        "the learned gate must not create streaming state")
    } finally q.stop()
  }

  test("train validates input and featurize is stable") {
    val spark2 = spark
    import spark2.implicits._
    intercept[IllegalArgumentException] {
      LinearClassifier.train(Seq.empty[(String, Double)].toDF("t", "y"),
        col("t"), col("y"), iters = 1)
    }
    // MurmurHash3 feature hashing is stable run-to-run (a persisted
    // model is useless if the featurizer drifts).
    val f1 = LinearClassifier.featurize("the quick brown fox", 1 << 10)
    val f2 = LinearClassifier.featurize("the quick brown fox", 1 << 10)
    assert(f1.toSeq == f2.toSeq && f1.nonEmpty)
    // Unigrams + bigrams: 4 + 3 distinct features; L2-style scaling
    // puts the squared norm at 1 when all grams are distinct.
    assert(f1.length == 7 &&
      math.abs(f1.map(v => v._2 * v._2).sum - 1f) < 1e-5)
  }
}
