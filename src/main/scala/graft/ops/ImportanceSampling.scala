package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * arXiv:2302.03169 — public recipe): select raw-corpus documents that look
  * like a small TARGET corpus by (1) fitting hashed bag-of-ngram
  * generative models on both corpora, (2) scoring every raw doc with the
  * importance log-weight Σ_grams log(p_target/p_raw), and (3) drawing an
  * exact-k sample ∝ exp(weight) with the Gumbel top-k trick.
  *
  * Scale posture: the only corpus-wide passes are (a) ONE
  * explode+groupBy over hashed buckets to fit each model — output is
  * `buckets` rows (driver-scale by construction, the LM-vocabulary
  * posture) — and (b) ONE map-only projection scoring every doc against
  * the broadcast log-ratio array (a single array literal; `element_at`
  * per gram, no join, no shuffle), finished by a global top-k
  * (`TakeOrderedAndProject`, k rows cross the wire). Determinism is the
  * q69/q105 contract: no RNG state anywhere — the Gumbel noise is a
  * seeded md5 content hash of the doc id, so the sample is identical
  * across runs, partitionings, and task retries, and changing `seed`
  * draws an independent sample.
  */
object ImportanceSampling {

  /** Feature-space bound: the model is `buckets` doubles collected to the
    * driver and re-shipped as one literal — 2^17 doubles = 1 MiB, the
    * ceiling where "driver-scale by construction" stays true. */
  val maxBuckets = 131072

  private def checkBuckets(buckets: Int): Unit =
    require(buckets >= 16 && buckets <= maxBuckets,
      s"buckets must be in [16, $maxBuckets], got $buckets")

  /** Hashed unigram+bigram bucket ids for one document: word 1-grams and
    * 2-grams (native `word_shingles`), empty-string grams dropped (so
    * null/empty docs featurize to an EMPTY array and score neutral 0.0,
    * never the ""-bucket's ratio), each gram hashed to
    * `pmod(xxhash64(gram), buckets)`. Pure projection — stays inside
    * whole-stage codegen. */
  def gramBuckets(text: Column, buckets: Int): Column = {
    checkBuckets(buckets)
    val grams = concat(TextOps.wordShingles(text, 1), TextOps.wordShingles(text, 2))
    transform(filter(grams, g => g =!= ""),
      g => pmod(xxhash64(g), lit(buckets.toLong)).cast("int"))
  }

  /** Fit the hashed bag-of-ngrams model: smoothed bucket probabilities
    * p[b] = (count[b] + alpha) / (total + alpha·buckets), collected to a
    * driver array (≤ `buckets` rows — bounded by [[maxBuckets]]). */
  def bucketProbs(docs: DataFrame, text: Column, buckets: Int,
                  alpha: Double = 1.0): Array[Double] = {
    checkBuckets(buckets)
    require(alpha > 0.0, s"alpha must be positive (zero-count buckets need mass), got $alpha")
    val counts = new Array[Long](buckets)
    docs.select(explode(gramBuckets(text, buckets)).as("b"))
      .groupBy("b").count()
      .collect().foreach(r => counts(r.getInt(0)) = r.getLong(1))
    val total = counts.sum.toDouble
    val denom = total + alpha * buckets
    counts.map(c => (c + alpha) / denom)
  }

  /** Per-bucket log(p_target/p_raw) — the broadcast scoring model. */
  def logRatios(target: Array[Double], raw: Array[Double]): Array[Double] = {
    require(target.length == raw.length,
      s"model dims differ: target=${target.length} raw=${raw.length} — " +
        "both corpora must be featurized with the same bucket count")
    target.zip(raw).map { case (t, r) => math.log(t / r) }
  }

  /** Importance log-weight column: Σ over the doc's gram buckets of the
    * literal ratio array — one `aggregate` HOF over a projection, map-only.
    * Docs with no grams (null/empty text) score exactly 0.0 (neutral). */
  def logWeight(text: Column, ratios: Array[Double]): Column = {
    val lit0 = typedlit(ratios.toSeq)
    aggregate(gramBuckets(text, ratios.length), lit(0.0),
      (acc, b) => acc + element_at(lit0, b + 1))
  }

  /** Score every doc: `(id, logw)`, map-only. */
  def importanceLogWeights(docs: DataFrame, id: Column, text: Column,
                           ratios: Array[Double]): DataFrame =
    SkewOps.fanOutScan(docs).select(id.as("doc_id"), logWeight(text, ratios).as("logw"))

  /** Strictly-interior (0,1) uniform from a seeded content hash of the id:
    * the first 13 md5 hex chars as an integer h ∈ [0, 16^13), mapped to
    * (h + 0.5)/16^13 — 16^13 < 2^53 so the double is exact, and the ±0.5
    * offset keeps log(-log(u)) finite at both ends. */
  private def hashUniform(seed: String, id: Column): Column =
    (conv(substring(md5(concat_ws(":", lit(seed), id.cast("string"))), 1, 13),
      16, 10).cast("double") + lit(0.5)) / lit(4.503599627370496e15) // 16^13 = 2^52

  /** Gumbel top-k importance resample: draw exactly `k` docs WITHOUT
    * replacement with probability ∝ exp(logw) (Plackett–Luce), by ranking
    * on `logw + Gumbel(seed, id)` and keeping the k largest — the
    * standard reduction of weighted sampling to a top-k, which Spark
    * executes as `TakeOrderedAndProject` (no global sort materializes).
    * Ties (astronomically unlikely with content-hash noise) break by id.
    * NULL ids are dropped explicitly — a content-hash draw needs an id
    * (the [[graft.api.Pipelines.mixSources]] contract). Returns the
    * surviving docs' full rows, schema preserved. */
  def resampleTopK(docs: DataFrame, id: Column, text: Column,
                   ratios: Array[Double], k: Int,
                   seed: String = "dsir"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val key = logWeight(text, ratios) +
      -log(-log(hashUniform(seed, id)))
    docs.where(id.isNotNull)
      .withColumn("__gk", key)
      .orderBy(col("__gk").desc, id)
      .limit(k)
      .drop("__gk")
  }
}
