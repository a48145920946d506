package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-accelerated EXACT operators for 100 TB pipelines, built on
  * Spark's mergeable sketches (`org.apache.spark.util.sketch`, built in one
  * distributed pass via `df.stat`) probed row-side by graft's native
  * expressions (`bloom_might_contain` / `cms_estimate`).
  *
  * The design rule: the sketch only PRUNES, it never decides. Both sketches
  * are one-sided (a Bloom filter has no false negatives; count-min never
  * undercounts), so filtering the big side by a sketch probe keeps a
  * superset of the true answer, and an exact verify on the survivors
  * restores exactness. What the sketch buys is where the work dies at
  * scale: rows are dropped BEFORE the shuffle, so the exchange carries
  * survivors instead of the full input.
  */
object SketchOps {

  /** Serialized Bloom filter over a column, built in one distributed pass
    * (treeAggregate under `df.stat.bloomFilter` — only the sketch reaches
    * the driver). `expectedItems <= 0` means "count the rows first"
    * (fine for a side that is small relative to the big side; pass an
    * estimate to skip that job at scale). */
  def bloomBytes(df: DataFrame, colName: String, fpp: Double = 0.01,
                 expectedItems: Long = -1L): Array[Byte] = {
    // stat.bloomFilter NPEs on an empty frame (null aggregation buffer);
    // an empty input legitimately means "nothing can match". The sizing
    // count doubles as the emptiness check so the default path scans the
    // probe side once before the sketch pass, not twice (isEmpty is kept
    // only where no count runs — when the caller supplied the size).
    val n = if (expectedItems > 0) expectedItems else df.count()
    val empty = if (expectedItems > 0) df.isEmpty else n == 0
    val bf =
      if (empty) org.apache.spark.util.sketch.BloomFilter.create(1L, fpp)
      else df.stat.bloomFilter(colName, n, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Serialized count-min sketch over a column (one distributed pass;
    * eps·N additive overcount bound with `confidence`, never undercounts). */
  def cmsBytes(df: DataFrame, colName: String, eps: Double = 1e-3,
               confidence: Double = 0.99, seed: Int = 42): Array[Byte] = {
    val cms =
      if (df.isEmpty)
        org.apache.spark.util.sketch.CountMinSketch.create(eps, confidence, seed)
      else df.stat.countMinSketch(colName, eps, confidence, seed)
    val out = new ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }

  /** Membership probe column against a serialized Bloom filter. */
  def bloomProbe(sketch: Array[Byte], key: Column): Column =
    call_function("bloom_might_contain", lit(sketch), key)

  /** Frequency-upper-bound probe column against a serialized count-min
    * sketch. */
  def cmsProbe(sketch: Array[Byte], key: Column): Column =
    call_function("cms_estimate", lit(sketch), key)

  /** EXACT left-semi join with a Bloom prefilter on the big side.
    *
    * Identical result to `big SEMI JOIN small ON big[bigKey] = small[smallKey]`
    * (the exact join on the survivors kills the filter's false positives),
    * but the big side is cut to ~hit-rate + fpp BEFORE any exchange. When
    * `small` fits a broadcast hash join the filter just saves hash probes;
    * the 100 TB case is the one where `small` is 10–100M keys — too big to
    * broadcast as a hash relation, so the join sort-merges, and the Bloom
    * probe (~1.2 MB per 1M keys at 1% fpp) prunes the big side's shuffle
    * to survivors only.
    */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
                    small: DataFrame, smallKey: String,
                    fpp: Double = 0.01): DataFrame =
    bloomSemiJoinWith(big, bigKey, bloomSemiSketch(small, smallKey, fpp),
      small, smallKey)

  /** The semi-join prefilter sketch: Bloom over `xxhash64(key)`, probed as
    * a LONG — the same design as Spark's injected runtime filters. The
    * row-side probe hashes the key natively in codegen (no per-row String
    * or byte[] allocation — measured 2× on a 6M-row probe vs string
    * probing) and the filter stores 64-bit hashes regardless of key width.
    * One-sidedness is preserved (equal keys hash equal, so a present key
    * can never be rejected); xxhash collisions only add false positives,
    * which the exact verify join removes. */
  def bloomSemiSketch(small: DataFrame, smallKey: String, fpp: Double = 0.01,
                      expectedItems: Long = -1L): Array[Byte] =
    bloomBytes(small.select(xxhash64(col(smallKey)).as("__graft_h")),
      "__graft_h", fpp, expectedItems)

  /** [[bloomSemiJoin]] with a PREBUILT [[bloomSemiSketch]] — the
    * steady-state shape: building the filter costs two jobs over the small
    * side (a sizing count + the treeAggregate sketch pass), so pipelines
    * that probe the same key set repeatedly (per-batch contamination
    * checks against a fixed eval set) should build once, persist the
    * bytes, and pay only the probe + survivor join per batch. */
  def bloomSemiJoinWith(big: DataFrame, bigKey: String, sketch: Array[Byte],
                        small: DataFrame, smallKey: String): DataFrame = {
    // Alias the verify side's key so equal names on both inputs stay
    // unambiguous in the join condition.
    val verifyKey = "__graft_bloom_verify_key"
    val verify = small.select(col(smallKey).as(verifyKey)).distinct()
    big.where(bloomProbe(sketch, xxhash64(col(bigKey))))
      .join(verify, col(bigKey) === verify(verifyKey), "left_semi")
  }

  /** EXACT heavy hitters: items occurring at least `minCount` times, with
    * their exact counts.
    *
    * Two passes, no full-width shuffle: pass 1 folds every row into a
    * count-min sketch (map-side merged; only the sketch moves); pass 2
    * keeps rows whose sketch estimate clears `minCount` — a superset of
    * the true heavy hitters, since count-min never undercounts — then
    * exact-counts ONLY the surviving candidates and re-applies the
    * threshold. The shuffle carries candidate rows instead of the whole
    * multiset; for vocabulary-shaped data (few heavy keys, a long unique
    * tail) that is the difference between shuffling everything and
    * shuffling almost nothing. Null items are ignored, as in
    * `GROUP BY`-with-`HAVING` semantics they'd form their own group —
    * callers wanting nulls counted should coalesce first.
    */
  def heavyHitters(items: DataFrame, itemCol: String, minCount: Long,
                   eps: Double = 1e-3, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    val sketch = cmsBytes(items, itemCol, eps, confidence, seed)
    items.where(cmsProbe(sketch, col(itemCol)) >= minCount)
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
  }

  /** Reaggregatable distinct-count sketch table — the 100 TB rollup
    * pattern. One HLL sketch per fine-grained group (e.g. day × type);
    * any coarser rollup later MERGES sketches instead of re-reading raw
    * data, because HLL union is lossless over sketches: a year of daily
    * per-dimension sketches answers "distinct users last quarter, by
    * type" from kilobytes. Plain `count(distinct)` cannot do this —
    * distinct counts are not additive across groups. */
  def hllSketchTable(df: DataFrame, itemCol: String,
                     groupCols: String*): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(itemCol)).as("hll"))

  /** Roll a sketch table up to `keepCols` (empty = global): sketches merge
    * via `hll_union_agg`, then one estimate per surviving group. */
  def hllRollup(sketchTable: DataFrame, keepCols: String*): DataFrame = {
    val est = hll_sketch_estimate(hll_union_agg(col("hll"))).as("approx_distinct")
    if (keepCols.isEmpty) sketchTable.agg(est)
    else sketchTable.groupBy(keepCols.map(col): _*).agg(est)
  }

  /** Reaggregatable QUANTILE sketch table — [[hllSketchTable]]'s analog
    * for percentiles, which are just as non-additive as distinct counts:
    * one KLL sketch per fine-grained group; any coarser percentile later
    * merges sketches (lossless over sketches, bounded rank error) instead
    * of re-reading raw data. A year of daily per-dimension sketches
    * answers "p95 latency last quarter, by type" from kilobytes. */
  def kllSketchTable(df: DataFrame, valueCol: String,
                     groupCols: String*): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(kll_sketch_agg_double(col(valueCol).cast("double")).as("kll"))

  /** Roll a KLL sketch table up to `keepCols` (empty = global) and answer
    * the given quantiles from the merged sketch: one `p<q>` column per
    * requested quantile (rank error ~1.65% at the default sketch size). */
  def kllRollup(sketchTable: DataFrame, quantiles: Seq[Double],
                keepCols: String*): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1),
      s"quantiles must be within [0,1], got $quantiles")
    require(quantiles.map(q => math.round(q * 100)).distinct.size == quantiles.size,
      s"quantiles collide after p<percent> naming (e.g. 0.5 and 0.501): $quantiles")
    val merged = kll_merge_agg_double(col("kll")).as("kll")
    val base =
      if (keepCols.isEmpty) sketchTable.agg(merged)
      else sketchTable.groupBy(keepCols.map(col): _*).agg(merged)
    quantiles.foldLeft(base) { (df, q) =>
      df.withColumn(f"p${math.round(q * 100)}%d",
        kll_sketch_get_quantile_double(col("kll"), lit(q)))
    }.drop("kll")
  }
}
