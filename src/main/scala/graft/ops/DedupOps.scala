package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication pipelines for training data (SURVEY.md §2.2 q33/q34 and
  * q54–q57): exact dup groups, pairwise Jaccard, MinHash signatures,
  * MinHash+LSH banding, SimHash, char-n-gram Jaccard.
  *
  * Scale posture (the 100 TB story):
  *  - Exact dedup is one hash-partitioned groupBy on a short digest — the
  *    shuffle carries (digest, id), never the documents themselves.
  *  - Pairwise Jaccard via an inverted-index self-join is O(pairs sharing a
  *    token) — correct at bench scale, quadratic in the worst case. It is
  *    the *verifier*, not the candidate generator, beyond small corpora.
  *  - The scale path is [[minhashSignatures]] → [[lshCandidates]] →
  *    [[jaccardVerify]]: signatures are mergeable per-doc aggregates
  *    (map-side combined), banding turns the pair space into ~O(n) bucket
  *    groups, and only bucket-cohabiting pairs are exact-verified.
  *  - All hashes are md5-derived: deterministic, seedable by string prefix,
  *    identical across engines (the cross-engine oracle relies on this).
  */
object DedupOps {

  /** (id, token) relation, distinct — the shared front-end of every
    * token-based dedup path (exact Jaccard and MinHash use the same one, so
    * the two paths are comparable by construction). */
  def tokenSet(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), explode(TextOps.tokens(text)).as("w")).distinct()

  /** Distinct (id, shingle) relation over character n-grams. */
  def charShingleSet(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    df.select(id.as("doc_id"), explode(TextOps.charShingles(text, n)).as("sh"))
      .distinct()

  /** Distinct (id, shingle) relation over word n-grams — the shared shape
    * of the contamination queries (q79/q82) and their bench twin; one
    * definition so shingle semantics cannot drift between them. */
  def wordShingleSet(df: DataFrame, id: Column, text: Column, n: Int = 3): DataFrame =
    df.select(id.as("doc_id"), explode(TextOps.wordShingles(text, n)).as("sh"))
      .distinct()

  /** Exact-duplicate groups keyed by a prefix digest: groups with >1 member,
    * keeping the smallest id as the canonical representative. */
  def exactDupGroups(df: DataFrame, id: Column, text: Column, prefixLen: Int = 16): DataFrame =
    df.select(id.as("doc_id"), md5(substring(text, 1, prefixLen)).as("h"))
      .groupBy("h")
      .agg(count(lit(1)).as("c"), min("doc_id").as("keep"))
      .where(col("c") > 1)

  /** C4-style SPAN-level exact dedup (q92): cut each document into
    * fixed-width `spanWords`-word spans and keep only the first occurrence
    * of each distinct span text corpus-wide — boilerplate shared INSIDE
    * otherwise-distinct documents is caught where whole-document dedup
    * ([[exactDupGroups]]) cannot see it. Keeper = lexicographically-first
    * (doc, span) occurrence as a `min(struct(doc_id, span_no))` — a
    * lexicographic struct min, so there is NO per-document span-count cap
    * (an earlier doc_id·1000 + span_no encoding silently collided above
    * 1000 spans/doc; a 25k-word web document is real at corpus scale). The
    * DECLARED q92 keeps the numeric encoding in its SQL contract — the
    * two keepers agree exactly while span_no < 1000, which the fixture
    * satisfies by construction (base-1000 encoding IS lexicographic
    * order in that regime); the library operator is the uncapped form.
    *
    * Scale shape: one explode (narrow), one hash agg on the span text
    * (partial min per partition — a boilerplate span repeated across the
    * whole corpus combines map-side, so the hot key ships one row per
    * partition, not one per occurrence), one equi-join back. The join IS
    * keyed by span text, so a mega-hot span skews the probe side — and
    * AQE's skew-join rule CANNOT split it: `OptimizeSkewedJoin` only
    * matches a sort-merge join whose children are bare shuffle stages,
    * and the keeper side here is Sort(HashAggregate(ShuffleStage))
    * (executed-plan evidence pinned in PlanSpec). Pass `salts > 0` for
    * corpora with corpus-wide boilerplate: the occurrence side is salted
    * by row content and the keeper side replicated, so the hot span's
    * rows spread over `salts` reduce buckets — decisions are
    * order-independent (min is associative), results identical. With
    * `hotSpans` also given, ONLY those span texts salt and the cold
    * majority joins plain: `graft.SkewProbe` measured that full salting
    * replicates the whole keeper and loses 5× exactly in the
    * huge-keeper regime that needs salting at all — feed the hot list
    * from [[SketchOps]]' count-min heavy hitters over the span relation,
    * or set `autoHotMinCount` and this does exactly that itself: spans
    * occurring ≥ that many times corpus-wide are detected via the
    * count-min pass (two extra narrow recomputes of the explode; the
    * sketch pass ships only sketch bytes, the exact-count pass shuffles
    * only candidate rows, and the driver holds at most
    * |corpus spans| / autoHotMinCount hot texts) and salted — no caller
    * clairvoyance required. */
  def spanDedup(docs: DataFrame, id: Column, text: Column,
                spanWords: Int = 20, salts: Int = 0,
                hotSpans: Seq[String] = Nil,
                autoHotMinCount: Long = 0L): DataFrame = {
    require(spanWords > 0, s"spanWords must be positive, got $spanWords")
    val l = split(text, " ")
    // Null id/text rows are excluded (the H13 degenerate-row posture: a
    // null would poison the keeper key / vanish via posexplode anyway);
    // empty text yields ONE empty span, so all-empty docs dedup together.
    val spans = SkewOps.fanOutScan(docs).where(id.isNotNull && text.isNotNull).select(
        id.as("doc_id"),
        posexplode(transform(
          sequence(lit(0), floor((size(l) - 1) / lit(spanWords.toDouble)).cast("int")),
          i => concat_ws(" ", slice(l, i * spanWords + 1, lit(spanWords))))))
      .select(col("doc_id"), col("pos").cast("long").as("span_no"), col("col").as("span"))
    dedupSpans(spans, salts, hotSpans, autoHotMinCount)
  }

  /** VARIABLE-WIDTH span dedup at NATURAL boundaries: cut each document on
    * `separator` (a Java regex — "\\n{2,}" for paragraphs, "(?<=[.!?]) "
    * for sentences; the fixture corpus carries no newlines, so specs use
    * an explicit marker), trim each segment, drop segments under
    * `minChars` (boundary splitting produces empty/near-empty fragments
    * around consecutive separators — noise, not boilerplate), and keep
    * only the first (doc, span) occurrence of each distinct segment
    * corpus-wide. The fixed-width form ([[spanDedup]]) misses real
    * boilerplate whenever the shared text sits at different word OFFSETS
    * in different documents (the windows misalign and no window pair is
    * equal — OpsSpec constructs exactly that case); C4-style natural-
    * boundary spans are offset-invariant because the boundary travels
    * with the text. `span_no` numbers the KEPT segments in order; docs
    * with no qualifying segment contribute no rows. Same keeper, salting,
    * and auto-hot-span machinery as the fixed form ([[dedupSpans]]). */
  def boundarySpanDedup(docs: DataFrame, id: Column, text: Column,
                        separator: String = "\\R{2,}", minChars: Int = 1,
                        salts: Int = 0, hotSpans: Seq[String] = Nil,
                        autoHotMinCount: Long = 0L): DataFrame = {
    require(minChars >= 1, s"minChars must be >= 1, got $minChars")
    require(separator.nonEmpty, "empty separator — use spanDedup for windowing")
    // Default separator: Java-regex \R (ANY line break — \n, \r\n, \r,
    // U+2028...), so CRLF web text paragraph-splits too (a bare \n{2,}
    // never fires on \r\n\r\n and silently degrades to whole-doc dedup).
    // Trim is a WHITESPACE regex trim, not `trim()` (which strips only
    // 0x20): segments differing by stray \r/\t edges must still dedup.
    // One alternation pass, not two chained regexp_replace calls — the
    // chained form cost a second full regex scan per segment (measured
    // ~1.3× on the bench extra, round 8 → 9).
    val segs = filter(
      transform(split(text, separator),
        s => regexp_replace(s, "^\\s+|\\s+$", "")),
      s => length(s) >= minChars)
    val spans = SkewOps.fanOutScan(docs).where(id.isNotNull && text.isNotNull)
      .select(id.as("doc_id"), posexplode(segs))
      .select(col("doc_id"), col("pos").cast("long").as("span_no"), col("col").as("span"))
    dedupSpans(spans, salts, hotSpans, autoHotMinCount)
  }

  /** Shared back half of the span-dedup family: keeper = lexicographic
    * `min(struct(doc_id, span_no))` per span text (no per-document span
    * cap), optional content-salted skew join with a known or count-min
    * auto-detected hot-span list. See [[spanDedup]] for the full scale
    * discussion. */
  private def dedupSpans(spans: DataFrame, salts: Int,
                         hotSpans: Seq[String],
                         autoHotMinCount: Long): DataFrame = {
    require(hotSpans.isEmpty || salts > 0,
      "hotSpans given but salts = 0 — the skew mitigation would silently not run")
    require(autoHotMinCount == 0L || salts > 0,
      "autoHotMinCount given but salts = 0 — the skew mitigation would silently not run")
    require(hotSpans.isEmpty || autoHotMinCount == 0L,
      "pass a known hotSpans list OR autoHotMinCount, not both")
    val keyed = spans.select(col("doc_id"), col("span_no"), col("span"),
      struct(col("doc_id"), col("span_no")).as("k"))
    val keeper = keyed.groupBy("span").agg(min("k").as("kk"))
    val hot: Seq[String] =
      if (autoHotMinCount > 0L)
        SketchOps.heavyHitters(spans.select("span"), "span", autoHotMinCount)
          .select("span").collect().map(_.getString(0)).toSeq
      else hotSpans
    val joined =
      if (salts > 0 && hot.nonEmpty)
        SkewOps.saltedJoinHot(keyed, keeper, "span", salts, hot)
      else if (salts > 0 && autoHotMinCount == 0L)
        SkewOps.saltedJoin(keyed, keeper, "span", salts)
      // Auto mode that found nothing hot joins PLAIN: falling through to
      // full salting would replicate the whole keeper — the measured 5×
      // loss the hot-only path exists to avoid.
      else keyed.join(keeper, "span")
    joined
      .select(col("doc_id"), col("span_no"),
        col("kk.doc_id").as("keep_doc"),
        col("kk.span_no").as("keep_span"),
        (col("k") =!= col("kk")).as("is_dup"))
  }

  /** i-th MinHash: lexicographic min of a seeded md5 prefix — the hex min
    * equals the numeric min of the underlying 48-bit value. */
  private def minhashCol(i: Int): Column =
    min(substring(md5(concat(lit(s"$i:"), col("w"))), 1, 12)).as(s"h$i")

  /** k-hash MinHash signature per doc over a (doc_id, w) token relation.
    * A single mergeable aggregation: partial min() per partition, one
    * shuffle of (doc_id, k short strings). */
  def minhashSignatures(tokens: DataFrame, k: Int): DataFrame =
    tokens.groupBy("doc_id").agg(minhashCol(1), (2 to k).map(minhashCol): _*)

  /** Band keys for LSH: `bands` bands of `rowsPerBand` signature rows each;
    * docs sharing any full band land in the same bucket. One explode pass —
    * NOT a per-band unionAll, which would recompute the signature
    * aggregation `bands` times (observed: 4x the scans/exchanges in the
    * executed plan before this shape). */
  def lshBandKeys(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val cols = (1 to rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      concat(lit(s"b${b + 1}:") +: cols: _*)
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
  }

  /** Candidate pairs: docs co-habiting any band bucket (id1 < id2). The
    * self-join is on the band key — an equi-join whose shuffle is sized by
    * bucket population, not by the all-pairs space. */
  def lshCandidates(bandKeys: DataFrame): DataFrame = {
    val a = bandKeys.select(col("doc_id").as("d1"), col("bk"))
    val b = bandKeys.select(col("doc_id").as("d2"), col("bk").as("bk2"))
    a.join(b, col("bk") === col("bk2") && col("d1") < col("d2"))
      .select("d1", "d2").distinct()
  }

  /** Exact Jaccard over given candidate pairs, keeping pairs >= `threshold`.
    * |A∩B| via a token equi-join restricted to the candidates; sizes joined
    * back for |A∪B| = |A|+|B|−|A∩B|. */
  def jaccardVerify(tokens: DataFrame, candidates: DataFrame, threshold: Double): DataFrame = {
    val sizes = tokens.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ta = tokens.select(col("doc_id").as("d1"), col("w"))
    val tb = tokens.select(col("doc_id").as("d2b"), col("w").as("wb"))
    val inter = candidates
      .join(ta, Seq("d1"))
      .join(tb, col("d2") === col("d2b") && col("w") === col("wb"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
    val j = col("i").cast("double") /
      (col("s1.n") + col("s2.n") - col("i"))
    inter
      .join(sizes.as("s1"), col("s1.doc_id") === col("d1"))
      .join(sizes.as("s2"), col("s2.doc_id") === col("d2"))
      .where(j >= threshold)
      .select(col("d1"), col("d2"), round(j, 4).as("j"))
  }

  /** [[jaccardVerify]] with the per-pair math over collected token ARRAYS:
    * one aggregation builds each doc's token set, candidates join the two
    * sets, and `array_intersect` computes |A∩B| inside the projection —
    * two joins and one agg versus jaccardVerify's four joins and two aggs,
    * and no candidate×token intermediate (the token-level form explodes
    * each pair into |A| rows before the second join). Same result rows
    * (identical math and rounding); the doc token set must fit in executor
    * memory, which holds for documents by construction.
    *
    * Use this over a MATERIALIZED candidate set (4.2× faster there —
    * 24.8 s → 5.9 s at 9.3M sf0.1 candidates); inside one fused lazy plan
    * the token-level form wins on exchange reuse (see [[minhashLsh]]). */
  def jaccardVerifyCompact(tokens: DataFrame, candidates: DataFrame,
                           threshold: Double): DataFrame = {
    // Set sizes come from the collected SET, not a row count — on a
    // non-distinct token relation a row count would inflate the union
    // term while the array_intersect stays set-based.
    val arr = tokens.groupBy("doc_id")
      .agg(collect_set(col("w")).as("toks"))
      .withColumn("n", size(col("toks")).cast("bigint"))
    val i = size(array_intersect(col("t1"), col("t2"))).cast("double")
    val j = i / (col("n1") + col("n2") - i)
    candidates
      .join(arr.select(col("doc_id").as("d1"), col("toks").as("t1"), col("n").as("n1")), Seq("d1"))
      .join(arr.select(col("doc_id").as("d2"), col("toks").as("t2"), col("n").as("n2")), Seq("d2"))
      .where(j >= threshold)
      .select(col("d1"), col("d2"), round(j, 4).as("j"))
  }

  /** All-pairs exact Jaccard >= `threshold` over a (doc_id, token/shingle)
    * relation via inverted-index self-join (the q34/q57 shape). `elem` names
    * the token column ("w" or "sh").
    *
    * AUDIT FORM — quadratic in pairs sharing a token, guarded: this throws
    * when the relation spans more than `maxDocs` documents (one counting
    * pass, cheap next to the join it gates) instead of silently launching
    * an all-pairs job that scales as n². The scale twins are
    * [[minhashLsh]] (banded candidates + exact verify, pair output) and
    * [[minhashDedupKeep]] (linear keep/drop decision); raise `maxDocs`
    * explicitly only for corpora you have deliberately sized. */
  def pairwiseJaccard(items: DataFrame, elem: String, threshold: Double,
                      maxDocs: Long = 25000): DataFrame = {
    val nDocs = items.select(col("doc_id")).distinct().count()
    require(nDocs <= maxDocs,
      s"pairwiseJaccard is the quadratic all-pairs audit form: $nDocs docs > " +
        s"maxDocs=$maxDocs. Use minhashLsh (banded candidates) or " +
        "minhashDedupKeep (linear keep/drop) at scale, or raise maxDocs " +
        "explicitly for a deliberately-sized audit.")
    val sizes = items.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = items.select(col("doc_id").as("d1"), col(elem).as("e"))
    val b = items.select(col("doc_id").as("d2"), col(elem).as("e2"))
    val inter = a.join(b, col("e") === col("e2") && col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
    val j = col("i").cast("double") / (col("s1.n") + col("s2.n") - col("i"))
    inter
      .join(sizes.as("s1"), col("s1.doc_id") === col("d1"))
      .join(sizes.as("s2"), col("s2.doc_id") === col("d2"))
      .where(j >= threshold)
      .select(col("d1"), col("d2"), round(j, 4).as("j"))
  }

  /** The full MinHash+LSH near-dup pipeline (q55): signature → bands →
    * bucket-join candidates → exact-Jaccard verify.
    *
    * The verify stays TOKEN-LEVEL here deliberately. Measured on the sf0.1
    * dense corpus (2.9M true pairs): over a MATERIALIZED candidate set the
    * compact array verify is 4.2× faster (24.8 s → 5.9 s at 9.3M
    * candidates) — but inside this single lazy plan the token relation
    * feeds signature, candidate and verify subplans, and Spark's exchange
    * reuse across those references outweighs the verify-stage win
    * (end-to-end uncached: 94 s token-level vs 100+ s compact; same at the
    * 1k-doc regime). Pipelines that persist candidates between stages —
    * the normal shape at 100 TB, where candidates are written out and
    * audited separately — should verify with [[jaccardVerifyCompact]].
    *
    * When the input is a DOC table (id, text) rather than an existing
    * token relation, use [[minhashLshDocs]]: output-identical, but
    * signatures become a projection and the verify a merge walk — ~3× this
    * pipeline on the dense bench slice (MinhashCostProbe, round 12). */
  def minhashLsh(tokens: DataFrame, k: Int, bands: Int, threshold: Double): DataFrame = {
    // bands > k would give 0 rows per band — every doc in ONE bucket, the
    // all-pairs quadratic blowup this operator exists to avoid; a k not
    // divisible by bands would silently drop trailing signature rows.
    require(bands >= 1 && k >= 1 && k % bands == 0,
      s"k ($k) must be a positive multiple of bands ($bands)")
    val sig = minhashSignatures(tokens, k)
    val cand = lshCandidates(lshBandKeys(sig, bands, k / bands))
    jaccardVerify(tokens, cand, threshold)
  }

  /** Doc-level MinHash+LSH near-dup pairs — output-identical to
    * [[minhashLsh]] over `tokenSet(docs)` (same buckets: the native
    * signature's 48-bit minima are the numeric values of the hex-string
    * minima, a bijection, so band co-habitation is unchanged; same exact
    * Jaccard math and 4dp rounding), but restructured around per-row
    * native expressions (round 12, MinhashCostProbe):
    *
    *  - signatures are a PROJECTION (`minhash_sig` over the token array) —
    *    no token explode, no k-way min aggregation, no signature shuffle;
    *  - the verify is `jaccard_sorted`, a merge walk over each doc's
    *    sorted-distinct token array — no per-pair `array_intersect` hash
    *    set and no candidate×token join explosion (the two verify forms
    *    minhashLsh chooses between cost 1.74 s / 2.61 s on the 1k-doc
    *    dense bench slice; this form's whole pipeline runs ~0.6 s).
    *
    * The only shuffles left are the band-bucket self-join, the candidate
    * `distinct`, and the two doc-array attach joins — all keyed, none
    * corpus×token. The doc projection (split + sort + signature) is
    * referenced by both the band side and the verify side; at corpus scale
    * persist it (or feed this from a materialized doc table) so the scan
    * runs once. */
  def minhashLshDocs(docs: DataFrame, id: Column, text: Column,
                     k: Int, bands: Int, threshold: Double): DataFrame = {
    require(bands >= 1 && k >= 1 && k % bands == 0,
      s"k ($k) must be a positive multiple of bands ($bands)")
    val r = k / bands
    val base = SkewOps.fanOutScan(docs).select(id.as("doc_id"),
        array_sort(array_distinct(TextOps.tokens(text))).as("toks"))
      .withColumn("sig", call_function("minhash_sig", col("toks"), lit(k)))
    val bandCols = (0 until bands).map { b =>
      concat_ws(":", lit(b) +: (0 until r).map(i => col("sig")(b * r + i).cast("string")): _*)
    }
    val keys = base.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
    val cand = keys.select(col("doc_id").as("d1"), col("bk"))
      .join(keys.select(col("doc_id").as("d2"), col("bk").as("bk2")),
        col("bk") === col("bk2") && col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    val j = call_function("jaccard_sorted", col("t1"), col("t2"))
    cand
      .join(base.select(col("doc_id").as("d1"), col("toks").as("t1")), Seq("d1"))
      .join(base.select(col("doc_id").as("d2"), col("toks").as("t2")), Seq("d2"))
      .where(j >= threshold)
      .select(col("d1"), col("d2"), round(j, 4).as("j"))
  }

  /** CROSS-SET near-dup ids: the corpus docs whose token set is
    * near-duplicate (Jaccard ≥ `threshold`) of ANY row in `other` —
    * the fuzzy-decontamination kernel (a paraphrased or lightly-edited
    * eval leak shares its token SET while sharing few exact n-grams,
    * so the q82-style exact-overlap gate misses it). Same machinery as
    * [[minhashLshDocs]] (native `minhash_sig` signatures,
    * threshold-derived banding via [[minhashParamsFor]], merge-walk
    * `jaccard_sorted` verify) with the candidate join RESTRICTED to
    * cross-set pairs: corpus×corpus pairs never form, so the corpus's
    * own quadratic near-dup space stays out of the plan entirely —
    * candidate volume is corpus-keys × other-keys per bucket, and
    * `other` (an eval benchmark) is small enough that its exploded
    * band keys broadcast under AQE while the corpus side streams
    * narrow. `other` needs no id column (rows key by token-list md5
    * and dedup). Returns distinct corpus ids `(doc_id)`. */
  def crossNearDup(corpus: DataFrame, corpusId: Column, corpusText: Column,
                   other: DataFrame, otherText: Column,
                   threshold: Double, targetRecall: Double = 0.9,
                   maxK: Int = 32): DataFrame = {
    val (k, bands) = minhashParamsFor(threshold, targetRecall, maxK)
    val r = k / bands
    def side(df: DataFrame, idc: Column, tc: Column): DataFrame = df
      .select(idc.as("doc_id"),
        array_sort(array_distinct(TextOps.tokens(tc))).as("toks"))
      .where(col("doc_id").isNotNull && col("toks").isNotNull)
      .withColumn("sig", call_function("minhash_sig", col("toks"), lit(k)))
    val bandCols = (0 until bands).map { b =>
      concat_ws(":",
        lit(b) +: (0 until r).map(i => col("sig")(b * r + i).cast("string")): _*)
    }
    val corp = side(SkewOps.fanOutScan(corpus), corpusId, corpusText)
    val ev = side(other, md5(otherText.cast("string")), otherText)
      .dropDuplicates("doc_id")
    // Round 15 (guide §1.2 "don't compute things you throw away" + §8):
    // ONE corpus pass, map-only. The previous shape materialized a
    // distinct (corpus, eval) candidate-pair relation and then re-attached
    // both sides' token arrays — which re-tokenized the ENTIRE corpus a
    // second time for the verify attach (the token projection feeds two
    // subplans with no exchange between them, so Spark re-computes it)
    // and paid a pair-keyed Exchange for the dedup. Instead the corpus
    // doc's own token array rides NEXT TO its band keys into the (bk)
    // broadcast join, the eval side's arrays attach from a second
    // broadcast, and the verify filter runs right there in the scan
    // task: tokenize+sign once, zero wide shuffles, only the final
    // (doc_id) distinct exchanges — the right 100 TB shape for a gate
    // whose one big side should stream exactly once. A pair sharing
    // multiple bands is now verified once per shared band instead of
    // once; that duplication is bounded by `bands` (≤ maxK) and costs a
    // merge walk per hit, while the dedup it replaces cost a pair-scale
    // Exchange plus the second corpus tokenize. Measured on the bench
    // extra (with the fanOutScan below): 1.40 → 0.70 s median; the only
    // exchanges left are the scan fan-out and the final doc_id distinct
    // (0.9 MB total), and q190's oracle hash pins output identity.
    // Both broadcast sides are eval-scale — an eval
    // benchmark is small by contract (the reason cross-set LSH beats
    // corpus×corpus in the first place).
    val ek = ev.select(col("doc_id").as("__eid"), explode(array(bandCols: _*)).as("bk"))
      .distinct()
    val j = call_function("jaccard_sorted", col("toks"), col("t2"))
    corp.select(col("doc_id"), col("toks"), explode(array(bandCols: _*)).as("bk"))
      .join(broadcast(ek), Seq("bk"))
      .join(broadcast(ev.select(col("doc_id").as("__eid"), col("toks").as("t2"))),
        Seq("__eid"))
      .where(j >= threshold)
      .select(col("doc_id")).distinct()
  }

  /** Banding choice for [[minhashLshAuto]]: the LARGEST rows-per-band `r`
    * whose band count `b = ceil(ln(1−targetRecall) / ln(1−threshold^r))`
    * still fits `k = r·b <= maxK` hashes. P(pair at Jaccard j becomes a
    * candidate) = 1−(1−j^r)^b — an S-curve whose knee sits near
    * (1/b)^(1/r); maximizing r pushes the knee toward `threshold`, so
    * low-similarity pairs stop flooding buckets (candidate volume is what
    * kills fixed banding as the corpus grows — the q76 lesson, where fixed
    * bucket bits measured 129× slower at 10× data) while pairs at/above
    * threshold keep >= targetRecall. Returns (k, bands). */
  def minhashParamsFor(threshold: Double, targetRecall: Double = 0.9,
                       maxK: Int = 32): (Int, Int) = {
    require(threshold > 0 && threshold < 1, s"threshold in (0,1): $threshold")
    require(targetRecall > 0 && targetRecall < 1, s"recall in (0,1): $targetRecall")
    val fits = (1 to maxK).flatMap { r =>
      val pBand = math.pow(threshold, r)
      // Band count stays a Double until the fit check: at large r it blows
      // past Int range and a premature toInt would wrap the k = r·b bound.
      val b = math.max(1.0,
        math.ceil(math.log1p(-targetRecall) / math.log1p(-pBand)))
      if (r * b <= maxK) Some((r, b.toInt)) else None
    }
    require(fits.nonEmpty,
      s"no banding with k <= $maxK reaches recall $targetRecall at threshold " +
        s"$threshold — raise maxK or lower targetRecall")
    val (r, b) = fits.last
    (r * b, b)
  }

  /** [[minhashLsh]] with banding sized from the threshold and a recall
    * floor instead of fixture-pinned constants — the corpus-aware twin of
    * [[Ann.lshBitsFor]] for the text path. The declared q55 keeps its
    * pinned (k=8, bands=4) for oracle stability; pipelines should use
    * this. */
  def minhashLshAuto(tokens: DataFrame, threshold: Double,
                     targetRecall: Double = 0.9, maxK: Int = 32): DataFrame = {
    val (k, bands) = minhashParamsFor(threshold, targetRecall, maxK)
    minhashLsh(tokens, k, bands, threshold)
  }

  /** [[minhashLshDocs]] with threshold-derived banding — the production
    * near-dup pair path (`Pipelines.nearDuplicates`): doc-level native
    * signatures + merge-walk verify, banding from [[minhashParamsFor]]. */
  def minhashLshDocsAuto(docs: DataFrame, id: Column, text: Column,
                         threshold: Double, targetRecall: Double = 0.9,
                         maxK: Int = 32): DataFrame = {
    val (k, bands) = minhashParamsFor(threshold, targetRecall, maxK)
    minhashLshDocs(docs, id, text, k, bands, threshold)
  }

  /** LINEAR-output dedup decision (the true 100 TB shape): on near-dup-dense
    * corpora the pair list is quadratic in cluster size (measured at sf0.1:
    * 5k template-generated docs → 2.9M J≥0.8 pairs, so enumeration dominates
    * any candidate pruning). A training pipeline doesn't need the pairs — it
    * needs one keep/drop bit per document. Cluster key = the full MinHash
    * signature (identical signature ⇔ near-identical token set w.h.p.);
    * keeper = min doc_id per cluster. One aggregation + one window — output
    * size O(docs), shuffle keyed on the signature. */
  def minhashDedupKeep(tokens: DataFrame, k: Int): DataFrame = {
    val sig = minhashSignatures(tokens, k)
    val sigKey = concat_ws("|", (1 to k).map(i => col(s"h$i")): _*)
    sig.select(col("doc_id"), sigKey.as("sig"))
      .withColumn("keep_id",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("sig"))))
      .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
      .select("doc_id", "keep_id", "is_dup")
  }

  /** (doc_id, sigkey) via the single-pass native `minhash_sig` expression
    * — the shared front end of the linear dedup decision and the cross-run
    * incremental path: a pure projection, no token explode, no signature
    * aggregation. Requires a graft session (extension-registered
    * function). */
  def sigKeysFast(docs: DataFrame, id: Column, text: Column, k: Int = 8): DataFrame =
    SkewOps.fanOutScan(docs).select(id.as("doc_id"),
      array_join(transform(
        call_function("minhash_sig", TextOps.tokens(text), lit(k)),
        _.cast("string")), "|").as("sigkey"))

  /** Expression-based linear dedup decision: like [[minhashDedupKeep]] but
    * the signature comes from [[sigKeysFast]]; the ONLY shuffle is the
    * per-signature window. */
  def minhashDedupKeepFast(docs: DataFrame, id: Column, text: Column, k: Int = 8): DataFrame =
    sigKeysFast(docs, id, text, k)
      .withColumn("keep_id", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sigkey"))))
      .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
      .select("doc_id", "keep_id", "is_dup")

  /** Per-run dedup STATE for cross-run incremental dedup: one row per
    * distinct minhash signature with its cluster keeper (min doc id so
    * far). Kilobytes-to-megabytes per run — persist it between pipeline
    * runs and the next batch dedups against it WITHOUT re-reading this
    * corpus ([[incrementalDedup]]); fold the batch back in with
    * [[updatedFingerprints]]. */
  def fingerprintTable(docs: DataFrame, id: Column, text: Column, k: Int = 8): DataFrame =
    sigKeysFast(docs, id, text, k)
      .groupBy("sigkey").agg(min(col("doc_id")).as("keep_id"))

  /** Keep/drop for a NEW batch against a persisted prior-run fingerprint
    * table, sig-agnostic core: `newKeys` = (doc_id, sigkey) of the batch,
    * `prior` = (sigkey, keep_id) from previous runs. Union-min semantics:
    * keeper(sig) = min(prior keeper, batch min), so the decisions equal
    * running the from-scratch dedup over (prior corpus ∪ batch) restricted
    * to the batch — without touching the old corpus. Shuffles only the
    * batch's signatures plus a join against the (far smaller) fingerprint
    * table. Only batch rows are emitted: when a batch id undercuts a prior
    * keeper the batch doc keeps itself and the prior docs' historical
    * decisions are NOT rewritten (append-only pipelines with monotone ids
    * never hit this); [[updatedFingerprints]] still converges the state to
    * the true min for all later runs. */
  def incrementalDedupKeys(newKeys: DataFrame, prior: DataFrame): DataFrame = {
    val newMin = newKeys.groupBy("sigkey").agg(min(col("doc_id")).as("new_min"))
    val keeper = newMin
      .join(prior.select(col("sigkey").as("psig"), col("keep_id").as("prior_keep")),
        col("sigkey") === col("psig"), "left")
      .select(col("sigkey"),
        least(col("new_min"), coalesce(col("prior_keep"), col("new_min"))).as("keep_id"))
    newKeys.join(keeper, "sigkey")
      .select(col("doc_id"), col("keep_id"),
        (col("doc_id") =!= col("keep_id")).as("is_dup"))
  }

  /** [[incrementalDedupKeys]] over the native single-pass signatures. */
  def incrementalDedup(newDocs: DataFrame, id: Column, text: Column,
                       prior: DataFrame, k: Int = 8): DataFrame =
    incrementalDedupKeys(sigKeysFast(newDocs, id, text, k), prior)

  /** Fingerprint state after absorbing a new batch: union-min of the prior
    * table and the batch's own table — the persistence step of the
    * incremental loop. Idempotent (re-absorbing the same batch changes
    * nothing). */
  def updatedFingerprints(prior: DataFrame, newDocs: DataFrame,
                          id: Column, text: Column, k: Int = 8): DataFrame =
    prior.select(col("sigkey"), col("keep_id"))
      .unionByName(fingerprintTable(newDocs, id, text, k))
      .groupBy("sigkey").agg(min(col("keep_id")).as("keep_id"))

  /** Retract taken-down docs from a batch-era fingerprint state — the
    * [[graft.streaming.DedupLoop]] takedown semantics for the
    * batch/persisted path: every state row the retracted doc ANCHORS
    * (keep_id = its id) leaves the table, so the next content matching
    * that signature is admitted fresh instead of being dropped against
    * a doc that no longer exists (the self-defeating-takedown hazard
    * every index family guards). No-op for ids that anchor nothing
    * (non-keeper dups were never in the state); `ids` is one column,
    * nulls drop, broadcast anti join so a bucketed state's layout
    * survives. Persist the result to a NEW path
    * ([[persistFingerprints]] — never over the path being read). */
  def retractFingerprints(prior: DataFrame, ids: DataFrame): DataFrame = {
    require(ids.columns.length == 1, "ids must be a single id column")
    // Cast to the STATE's own keeper type (the fingerprint family is
    // id-type-generic): a hard long cast would turn a string-id state's
    // takedowns into silent no-ops; under ANSI a genuinely
    // incompatible id fails loudly instead.
    val keepType = prior.schema("keep_id").dataType
    val dead = ids.select(col(ids.columns.head).cast(keepType).as("__rm"))
      .where(col("__rm").isNotNull).distinct()
    prior.join(broadcast(dead), col("keep_id") === col("__rm"), "left_anti")
  }

  /** Persist fingerprint state BUCKETED by sigkey so every later run's
    * [[incrementalDedup]] joins it Exchange-free: the state scan already
    * satisfies the join's hash distribution, only the new batch's
    * signatures shuffle (plan-asserted in BucketedStateSpec) — at 100 TB
    * the state-side shuffle is the recurring cost this deletes. Write each
    * run's state to a NEW path and swap (never overwrite the path being
    * read — see [[graft.sources.Bucketed]]). */
  def persistFingerprints(fp: DataFrame, table: String, path: String,
                          buckets: Int = 32,
                          mode: org.apache.spark.sql.SaveMode =
                            org.apache.spark.sql.SaveMode.ErrorIfExists): Unit =
    graft.sources.Bucketed.write(fp.select(col("sigkey"), col("keep_id")),
      table, path, "sigkey", buckets, mode)

  /** Re-attach persisted fingerprint state (fresh session/run); `buckets`
    * must match the write. */
  def loadFingerprints(spark: org.apache.spark.sql.SparkSession, table: String,
                       path: String, buckets: Int = 32): DataFrame =
    graft.sources.Bucketed.register(spark, table, path, "sigkey", buckets)

  /** The persisted NEAR-dup index pair: band-bucket rows `(doc_id, bk)`
    * bucketed by `bk` (candidate generation joins Exchange-free) and
    * token rows `(doc_id, toks)` bucketed by `doc_id` (the verify's two
    * array attaches join Exchange-free) — the [[graft.ops.Ann]]
    * `persistIvfIndex` posture applied to [[minhashLshDocs]]'s banded
    * pipeline, so a GROWING corpus pays O(new batch) per near-dup
    * sweep instead of re-running the full self-join. Storage: tokens
    * once per doc (never per band); band keys are short strings. */
  def buildNearDupIndex(docs: DataFrame, id: Column, text: Column,
                        k: Int, bands: Int): (DataFrame, DataFrame) = {
    require(bands >= 1 && k >= 1 && k % bands == 0,
      s"k ($k) must be a positive multiple of bands ($bands)")
    val r = k / bands
    val base = docs.select(id.cast("long").as("doc_id"),
        array_sort(array_distinct(TextOps.tokens(text))).as("toks"))
      .where(col("doc_id").isNotNull)
      .withColumn("sig", call_function("minhash_sig", col("toks"), lit(k)))
    val bandCols = (0 until bands).map { b =>
      concat_ws(":", lit(b) +: (0 until r).map(i => col("sig")(b * r + i).cast("string")): _*)
    }
    (base.select(col("doc_id"), explode(array(bandCols: _*)).as("bk")),
      base.select(col("doc_id"), col("toks")))
  }

  /** Persist a [[buildNearDupIndex]] pair under `<table>_bk`/`<path>_bk`
    * (band buckets) and `<table>_tk`/`<path>_tk` (token arrays). */
  def persistNearDupIndex(index: (DataFrame, DataFrame), table: String,
                          path: String, buckets: Int = 32,
                          mode: org.apache.spark.sql.SaveMode =
                            org.apache.spark.sql.SaveMode.ErrorIfExists): Unit = {
    graft.sources.Bucketed.write(index._1, s"${table}_bk", s"${path}_bk",
      "bk", buckets, mode)
    graft.sources.Bucketed.write(index._2, s"${table}_tk", s"${path}_tk",
      "doc_id", buckets, mode)
  }

  /** Re-attach a persisted near-dup index; `buckets` must match the
    * write. */
  def loadNearDupIndex(spark: org.apache.spark.sql.SparkSession,
                       table: String, path: String,
                       buckets: Int = 32): (DataFrame, DataFrame) =
    (graft.sources.Bucketed.register(spark, s"${table}_bk", s"${path}_bk",
      "bk", buckets),
      graft.sources.Bucketed.register(spark, s"${table}_tk", s"${path}_tk",
        "doc_id", buckets))

  /** Where [[deleteFromNearDupIndex]] records removed doc ids: a small
    * parquet id list beside the index (append-only; reads dedup) — the
    * [[graft.ops.Ann.ivfTombstoneDir]] posture. */
  def nearDupTombstoneDir(path: String): String = Tombstones.dir(path)

  /** The current tombstone id set of a persisted near-dup index (empty
    * frame when none have been recorded). */
  def nearDupTombstones(spark: org.apache.spark.sql.SparkSession,
                        path: String): DataFrame =
    Tombstones.ids(spark, path, "doc_id")

  /** TOMBSTONE deletion for a persisted near-dup index — the takedown
    * path (a removed document must stop generating candidate pairs NOW,
    * not at the next rebuild). Deletes are MARKS, not rewrites (the
    * [[graft.ops.Ann.deleteFromIvfIndex]] posture: bucketed tables
    * cannot rewrite single files without breaking the bucket-file
    * naming contract, and takedown batches are tiny against the index):
    * ids append to a side list and [[appendNearDup]] /
    * [[loadNearDupIndexLive]] filter them with a broadcast anti join
    * that leaves both bucketed layouts intact. Scope is ADMISSION
    * control, like [[graft.streaming.DedupLoop]] retractions: pairs
    * ALREADY emitted against the doc are downstream state and are not
    * retracted here. Returns the number of batch ids live in the
    * physical index (0 = no-op batch: never indexed or already
    * deleted); tombstones are recorded regardless, so
    * delete-then-append races resolve to deleted. NULL ids drop. */
  def deleteFromNearDupIndex(spark: org.apache.spark.sql.SparkSession,
                             table: String, path: String, ids: DataFrame,
                             buckets: Int = 32): Long = {
    val (_, toks) = loadNearDupIndex(spark, table, path, buckets)
    Tombstones.recordDeletes(spark, path, "doc_id",
      Tombstones.normalize(ids, "doc_id", castLong = true),
      toks.select(col("doc_id")))
  }

  /** The LIVE view of a persisted near-dup index: both attachments minus
    * tombstoned docs. The anti joins broadcast the (takedown-bounded)
    * tombstone set, so the band-key and doc-id bucketing — and the
    * Exchange-free probes over them — survive the filter. */
  def loadNearDupIndexLive(spark: org.apache.spark.sql.SparkSession,
                           table: String, path: String,
                           buckets: Int = 32): (DataFrame, DataFrame) = {
    val (keys, toks) = loadNearDupIndex(spark, table, path, buckets)
    (Tombstones.liveFilter(keys, spark, path, "doc_id"),
      Tombstones.liveFilter(toks, spark, path, "doc_id"))
  }

  /** Rewrite the live rows to a FRESH index pair (never in place — the
    * [[graft.sources.Maintenance.compact]] rule), clearing the tombstone
    * debt: the new path has no tombstones, every physical row is live,
    * and previously-deleted ids become appendable again (see
    * [[appendNearDup]]'s clash guard, which checks PHYSICAL rows
    * precisely because the live filter would hide a tombstoned twin of
    * a re-added id). Swap consumers to the new (table, path) and drop
    * the old directories when convenient. */
  def compactNearDupIndex(spark: org.apache.spark.sql.SparkSession,
                          table: String, path: String,
                          newTable: String, newPath: String,
                          buckets: Int = 32): Unit = {
    Tombstones.requireFreshPath(path, newPath, "compactNearDupIndex")
    persistNearDupIndex(loadNearDupIndexLive(spark, table, path, buckets),
      newTable, newPath, buckets)
  }

  /** O(new-batch) near-dup maintenance: the pairs a NEW document batch
    * forms — against the persisted index AND within itself — verified
    * at `threshold`, with the batch appended into the index afterwards.
    * Folding batches B1..Bn this way emits, across all calls, EXACTLY
    * `minhashLshDocs(B1 ∪ … ∪ Bn)`'s pair set (every pair surfaces
    * when its later doc arrives — OpsSpec pins the equivalence), while
    * each call's wide work is sized by the batch: candidate generation
    * probes the bucketed band table (index side Exchange-free, only
    * batch keys shuffle), token attaches probe the bucketed token
    * table, and the batch self-join is batch×batch. Same id hygiene as
    * [[graft.ops.Ann.appendIvfIndex]]: ids must be non-null and
    * globally fresh — a duplicate would re-emit old pairs on every
    * later batch — enforced with a column-pruned scan of the token
    * table plus a batch-scale agg. Returns `(d1, d2, j)` with
    * `d1 < d2`. */
  def appendNearDup(spark: org.apache.spark.sql.SparkSession,
                    table: String, path: String,
                    newDocs: DataFrame, id: Column, text: Column,
                    k: Int, bands: Int, threshold: Double,
                    buckets: Int = 32): DataFrame = {
    // Probe the LIVE state: tombstoned docs must not generate pairs. The
    // clash guard below still checks PHYSICAL rows (a tombstoned twin is
    // invisible live, but re-appending its id would leave two physical
    // rows the live filter then kills BOTH of).
    val (physKeys, physToks) = loadNearDupIndex(spark, table, path, buckets)
    val dead = broadcast(nearDupTombstones(spark, path))
    val oldKeys = physKeys.join(dead, Seq("doc_id"), "left_anti")
    val oldToks = physToks.join(dead, Seq("doc_id"), "left_anti")
    val (newKeys0, newToks0) = buildNearDupIndex(newDocs, id, text, k, bands)
    val newKeys = newKeys0.localCheckpoint()
    val newToks = newToks0.localCheckpoint()
    val Array(nRows, nIds, nDistinct) = newDocs
      .agg(count(lit(1)), count(id), countDistinct(id)).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    require(nRows == nIds,
      s"appendNearDup: ${nRows - nIds} NULL id row(s) — every doc needs an id")
    require(nIds == nDistinct,
      s"appendNearDup: ${nIds - nDistinct} duplicate id value(s) within the batch")
    val clashIds = physToks.select(col("doc_id"))
      .join(newToks.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val clash = clashIds.count()
    if (clash != 0L) {
      val deadClash = clashIds
        .join(nearDupTombstones(spark, path), Seq("doc_id"), "left_semi").count()
      throw new IllegalArgumentException(
        s"appendNearDup: $clash batch id(s) already indexed — re-appending " +
          "would re-emit their pairs on every later batch; dedup the batch first" +
          (if (deadClash > 0) s" ($deadClash of them are tombstoned deletions — " +
            "compactNearDupIndex makes deleted ids re-appendable)" else ""))
    }
    val pairs = nearDupPairsCore(oldKeys, oldToks, newKeys, newToks, threshold)
      .localCheckpoint()
    graft.sources.Bucketed.appendRegistered(newKeys, s"${table}_bk", "bk", buckets)
    graft.sources.Bucketed.appendRegistered(newToks, s"${table}_tk", "doc_id", buckets)
    pairs
  }

  /** Broadcast gate for [[nearDupPairsCore]]'s batch side: below this
    * many batch docs the batch token/band frames broadcast and the
    * verify runs with ZERO payload bytes through any exchange (round
    * 16). Sizing: a 50k-doc batch at a few hundred tokens/doc is a
    * tens-of-MB hashed relation — well under broadcast comfort (guide
    * §3.1: "a few hundred MB is usually fine"), and fold batches are
    * O(batch) by the [[appendNearDup]]/NearDupLoop contract. Above the
    * gate the round-15 shuffle shape (which scales to any batch size)
    * is unchanged. */
  private[graft] val foldBroadcastMaxBatchDocs = 50000L

  /** The batch-vs-index pair kernel shared by [[appendNearDup]] and
    * [[graft.streaming.NearDupLoop]]: verified `(d1, d2, j)` pairs the
    * `new*` side forms against the `old*` side and within itself.
    * Callers own id hygiene, tombstone filtering, and the append. */
  private[graft] def nearDupPairsCore(oldKeys: DataFrame, oldToks: DataFrame,
                                      newKeys0: DataFrame, newToks0: DataFrame,
                                      threshold: Double,
                                      broadcastMaxBatchDocs: Long =
                                        foldBroadcastMaxBatchDocs): DataFrame = {
    // Round 15: the new side feeds FIVE subplans (vsOld probe, both
    // halves of the batch self-join, the candidate-doc explode, and the
    // verify token attach) — when the caller hands lazy frames, Spark
    // recomputes the batch tokenize + minhash_sig once per reference
    // (the bench fold showed 6 InMemoryTableScan→Generate branches).
    // Materialize batch-scale frames once; already-checkpointed inputs
    // (appendNearDup, NearDupLoop) pass through untouched.
    def materialize(df: DataFrame): DataFrame =
      if (df.queryExecution.logical.isInstanceOf[
          org.apache.spark.sql.execution.LogicalRDD]) df
      else df.localCheckpoint()
    val newKeys = materialize(newKeys0)
    val newToks = materialize(newToks0)
    // Round 16 (guide §2.3 "shuffle keys and metadata instead of
    // payloads" / §8, VERDICT r15 #3): the round-15 verify attached token
    // arrays to pairs with two pair-keyed joins, so the second exchange
    // carried pairs × token payload (~25 MB at the 500-doc bench fold —
    // the largest shuffle left in the fold path). Below the batch gate
    // the pair exchanges now carry IDS ONLY: batch band keys broadcast
    // into both candidate joins (the bucketed index side never moves),
    // old-side tokens attach where they live — the pair ids shuffle INTO
    // the bucketed token table's layout (index side Exchange-free) and
    // the Jaccard filter consumes the arrays in that same stage — and
    // new-side tokens attach from a batch-scale broadcast. vsOld and
    // vsNew pair sets are disjoint under the callers' fresh-id contract
    // (a pair with both docs in the batch cannot also have one doc in
    // the index), so per-set dedup equals the old union-wide distinct;
    // OpsSpec pins fold ≡ full-corpus output. Above the gate: the
    // round-15 shape, byte-identical.
    val batchDocs = newToks.count()
    if (batchDocs <= broadcastMaxBatchDocs) {
      val bKeys = broadcast(newKeys)
      val tNew = broadcast(newToks)
      val vsOld = bKeys.select(col("doc_id").as("n"), col("bk"))
        .join(oldKeys.select(col("doc_id").as("o"), col("bk")), Seq("bk"))
        .select(col("n"), col("o")).distinct()
      val jo = call_function("jaccard_sorted", col("tn"), col("to"))
      val oldPairs = vsOld
        .join(oldToks.select(col("doc_id").as("o"), col("toks").as("to")), Seq("o"))
        .join(tNew.select(col("doc_id").as("n"), col("toks").as("tn")), Seq("n"))
        .where(jo >= threshold)
        .select(least(col("n"), col("o")).as("d1"),
          greatest(col("n"), col("o")).as("d2"), round(jo, 6).as("j"))
      val vsNew = newKeys.select(col("doc_id").as("d1"), col("bk"))
        .join(bKeys.select(col("doc_id").as("d2"), col("bk").as("bk2")),
          col("bk") === col("bk2") && col("d1") < col("d2"))
        .select("d1", "d2").distinct()
      val jn = call_function("jaccard_sorted", col("t1"), col("t2"))
      val newPairs = vsNew
        .join(tNew.select(col("doc_id").as("d1"), col("toks").as("t1")), Seq("d1"))
        .join(tNew.select(col("doc_id").as("d2"), col("toks").as("t2")), Seq("d2"))
        .where(jn >= threshold)
        .select(col("d1"), col("d2"), round(jn, 6).as("j"))
      return oldPairs.unionByName(newPairs)
    }
    // Candidates: batch × index (probe side shuffles, bucketed side
    // doesn't) + batch × batch; both orientations normalize to d1 < d2.
    val vsOld = newKeys.select(col("doc_id").as("n"), col("bk"))
      .join(oldKeys.select(col("doc_id").as("o"), col("bk")), Seq("bk"))
      .select(least(col("n"), col("o")).as("d1"),
        greatest(col("n"), col("o")).as("d2"))
    val vsNew = newKeys.select(col("doc_id").as("d1"), col("bk"))
      .join(newKeys.select(col("doc_id").as("d2"), col("bk").as("bk2")),
        col("bk") === col("bk2") && col("d1") < col("d2"))
      .select("d1", "d2")
    val cand = vsOld.unionAll(vsNew).distinct()
    // Verify: each side's tokens come from whichever table holds the doc
    // (bucketed old side, checkpointed batch side).
    // Restrict the token table to candidate docs BEFORE any union (the
    // bucketed side stays Exchange-free under the semi join; unioning
    // first would drag the full index through the attach shuffles).
    val candDocs = cand.select(explode(array(col("d1"), col("d2"))).as("doc_id"))
      .distinct()
    val toks = newToks.unionByName(
      oldToks.join(candDocs, Seq("doc_id"), "left_semi"))
    val j = call_function("jaccard_sorted", col("t1"), col("t2"))
    cand
      .join(toks.select(col("doc_id").as("d1"), col("toks").as("t1")), Seq("d1"))
      .join(toks.select(col("doc_id").as("d2"), col("toks").as("t2")), Seq("d2"))
      .where(j >= threshold)
      .select(col("d1"), col("d2"), round(j, 6).as("j"))
  }

  /** Typed mergeable MinHash sketch (the `Aggregator` path of SURVEY.md
    * §4.3): one pass, one buffer of k minima per doc, element-wise merged —
    * partial aggregation happens map-side exactly like a sketch union.
    * Numerically identical to [[minhashSignatures]]: the hex-string min of a
    * fixed-width lowercase md5 prefix IS the numeric min of its 48-bit
    * value ([[MinHashAgg.hash48]]). */
  def minhashSignaturesTyped(tokens: DataFrame, k: Int): DataFrame = {
    import tokens.sparkSession.implicits._
    tokens.select(col("doc_id").cast("long"), col("w"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .agg(new MinHashAgg(k).toColumn.name("sig"))
      .toDF("doc_id", "sig")
  }

  /** Connected components over a near-dup pair list — the transitive
    * closure that turns pairwise matches into dedup CLUSTERS (a~b, b~c ⇒
    * {a,b,c} even when a,c were never compared). Distributed min-label
    * propagation WITH POINTER JUMPING: every node starts as its own label;
    * each round takes the min of its own and its neighbors' labels, then
    * jumps `label(u) ← label(label(u))` (label values are always node ids,
    * so the jump is a self-join of the label table). The jump doubles how
    * far the component minimum has travelled each round, so convergence is
    * O(log diameter) rounds, not O(diameter) — a 1000-link chain closes in
    * ~10 rounds instead of 1000 (plain propagation THREW at the default
    * maxIter on exactly that shape). Each round is two joins + one
    * aggregation; lineage is cut per round so plans stay bounded.
    *
    * If the labels have not provably converged within `maxIter` rounds this
    * THROWS — a silent exit would return split labels for any component
    * with 2^maxIter ≪ diameter, which is indistinguishable from a correct
    * answer downstream. The default 30 covers any graph whose diameter fits
    * in a billion hops, i.e. anything real.
    *
    * `checkpointDir`: by default rounds are cut with localCheckpoint
    * (executor-local blocks — fast, but on a real cluster an executor loss
    * kills the job mid-iteration). Pass a reliable directory (HDFS/S3) to
    * cut each round via an explicit parquet round-trip instead — the
    * 100 TB posture. (Deliberately NOT `df.checkpoint()`: that requires
    * mutating the SparkContext-GLOBAL checkpoint dir, and the pre-mutation
    * value is unrecoverable — `getCheckpointDir` returns a UUID-suffixed
    * subdirectory, so a save/restore silently repoints unrelated jobs'
    * checkpoints at a nested child.) Superseded intermediate cuts are
    * deleted as the iteration advances; the final cut stays on disk
    * backing the returned DataFrame, like a checkpoint would.
    *
    * Input: pairs (d1, d2). Output: (doc, label) for every node with at
    * least one edge, label = min node id of its component.
    *
    * `warmStart`: a prior `(doc, label)` table (what this function
    * returns) to seed labels from after an edge APPEND — the
    * O(new-data) maintenance posture (`pageRankWarm`'s CC twin). Sound
    * because appends only MERGE components and the iteration is
    * monotone: a prior label is the min node of the node's OLD
    * component — still a member of its (possibly merged) new component
    * and ≥ the new min — so it is a valid intermediate state of the
    * SAME fixpoint computation; nodes absent from the prior seed at
    * their own id as usual. From a warm start the propagation only has
    * to carry the smaller merged label from the merge point through the
    * absorbed component (then one pointer jump floods it), instead of
    * re-deriving every component from scratch; OpsSpec pins warm ≡
    * cold labels and 0-round stability at the fixpoint. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30,
                          checkpointDir: Option[String] = None,
                          warmStart: Option[DataFrame] = None): DataFrame = {
    val spark = pairs.sparkSession
    val runDir = checkpointDir.map(d =>
      s"$d/graft-cc-${java.util.UUID.randomUUID()}")
    var step = 0
    def cut(df: DataFrame): (DataFrame, Option[String]) = runDir match {
      case Some(base) =>
        val path = s"$base/step-$step"; step += 1
        df.write.mode("overwrite").parquet(path)
        (spark.read.parquet(path), Some(path))
      case None =>
        // localCheckpoint cuts LINEAGE but carries the child's
        // CONSTRAINT set forward (LogicalRDD.rewriteStatsAndConstraints)
        // — and this loop's per-round self-join DOUBLES that set, so by
        // round ~10 constraint rewriting dwarfs the actual work (a warm
        // start seeded from a prior run's output inherits its baggage
        // and visibly hangs in stats estimation). Rebuilding the frame
        // from the checkpointed RDD is a constraint-free boundary; the
        // parquet arm above is naturally free of it. The edge table is
        // cut ONCE from a shallow plan and scanned every round — it
        // keeps the raw internal-row checkpoint (no accumulation to
        // strip, and the Row re-encoding boundary would tax each scan).
        val ck = df.localCheckpoint()
        (spark.createDataFrame(ck.rdd, ck.schema), None)
    }
    def cutRaw(df: DataFrame): (DataFrame, Option[String]) = runDir match {
      case Some(_) => cut(df)
      case None    => (df.localCheckpoint(), None)
    }
    def drop(path: Option[String]): Unit = path.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    }
    val (e, ePath) = cutRaw(pairs.select(col("d1").as("u"), col("d2").as("v"))
      .unionAll(pairs.select(col("d2").as("u"), col("d1").as("v")))
      .distinct())
    var (labels, labelsPath) = cut(warmStart match {
      case None => e.select(col("u")).distinct().withColumn("label", col("u"))
      case Some(prior) =>
        e.select(col("u")).distinct()
          .join(prior.select(col("doc").as("u"), col("label").as("__pl")),
            Seq("u"), "left")
          .select(col("u"), coalesce(col("__pl"), col("u")).as("label"))
    })
    // Gated node-scale broadcasts (round 15, the GraphOps loop pattern):
    // every in-loop join pairs the loop-invariant edge table or another
    // node-scale frame with the label table, whose checkpointed-RDD stats
    // the planner cannot see — below the node-count gate the label-side
    // frames broadcast and the edges never re-shuffle; above it the
    // shuffle-join shape is unchanged. min/least label propagation is
    // plan-order independent, so q72/q189 stay hash-exact.
    val small = labels.count() <= graft.ops.GraphOps.loopBroadcastMaxNodes
    def bc(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    var converged = false
    var i = 0
    try {
      while (!converged && i < maxIter) {
        val prop = e.join(bc(labels.select(col("u").as("v"), col("label"))), "v")
          .groupBy("u").agg(min(col("label")).as("nlabel"))
        val stepped = labels.join(bc(prop), Seq("u"), "left")
          .select(col("u"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        // Pointer jump: label(u) ← label(label(u)). Every label value is a
        // node id of the same component (values only ever copy existing
        // labels, which start as node ids), so the lookup is a self-join;
        // labels only decrease, so the grand-label can only improve.
        val (next, nextPath) = cut(stepped
          .join(bc(stepped.select(col("u").as("gu"), col("label").as("gl"))),
            col("label") === col("gu"), "left")
          .select(col("u"),
            least(col("label"), coalesce(col("gl"), col("label"))).as("label")))
        val changed = next.select(col("u"), col("label").as("nl"))
          .join(bc(labels), "u").where(col("nl") =!= col("label")).limit(1).count()
        drop(labelsPath)
        labels = next
        labelsPath = nextPath
        converged = changed == 0
        i += 1
      }
    } finally drop(ePath)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: labels still changing after $maxIter rounds — " +
          "a component with diameter > maxIter would get silently split " +
          "labels; raise maxIter (rounds needed ~ worst component diameter)")
    // Warm-start premise check (append-only edge set): labels only ever
    // DECREASE, so a stale seed label from a node no longer in the graph
    // survives to the fixpoint looking exactly like a correct answer —
    // one node-scale anti-join catches the common violation (a rewritten
    // or shrunk pair set). A label that is still a node but no longer
    // the component min (an edge REMOVED between runs) is undetectable
    // short of a cold recompute; append-only remains the caller contract.
    if (warmStart.isDefined) {
      val ghost = labels.select(col("label").as("u")).distinct()
        .join(e.select(col("u")).distinct(), Seq("u"), "left_anti")
        .limit(1).count()
      require(ghost == 0L,
        "connectedComponents: warmStart labels reference node ids absent " +
          "from `pairs` — the edge set is not a superset of the prior " +
          "run's (warm start requires append-only edges); re-run cold")
    }
    labels.select(col("u").as("doc"), col("label"))
  }

  /** Deletion-aware [[connectedComponents]] maintenance — the fold for
    * a dedup pipeline that REMOVES documents (takedowns, retractions,
    * license filtering), where the append-only `warmStart` is unsound:
    * a removal can SPLIT a component, so stale labels cannot ride
    * globally. What CAN ride is every component the batch never
    * touches:
    *
    *  1. AFFECTED components: the prior labels of every endpoint of an
    *     added or removed edge (batch-scale — one broadcast semi join
    *     against the node-scale prior).
    *  2. CONE: all prior members of affected components, plus
    *     brand-new endpoints. An OLD edge never crosses components, so
    *     testing one endpoint extracts the cone's old edges in ONE
    *     keyed pass over the store (the canonical `distinct` then runs
    *     on the CONE, not the store — the [[graft.ops.GraphOps]]
    *     signedTriangleDelta lesson).
    *  3. Recompute labels COLD on `(cone ∖ removed) ∪ added` only;
    *     every other component's labels ride from `prior` untouched.
    *
    * Equal to the cold run on the whole new graph because the new
    * graph is the DISJOINT union of the riding subgraph (unchanged
    * nodes, unchanged edges — same per-component minima) and the cone
    * subgraph (recomputed); labels are component-local minima over
    * disjoint node sets, so they cannot collide. Same-batch
    * remove+re-add nets to untouched (add wins); removals of absent
    * edges and adds of present edges are no-ops; a node isolated by
    * the batch drops from the output, exactly as a cold run drops it.
    * Work is sized by Σ(affected component) + batch, not the graph —
    * but a deletion inside a giant component still reads that whole
    * component (inherent: its split/label structure is a global
    * property of the component).
    *
    * `prior` must be the [[connectedComponents]] output over
    * `oldEdges` (both frames `(d1, d2)`; `prior` is `(doc, label)`). */
  def connectedComponentsInc(prior: DataFrame, oldEdges: DataFrame,
                             addedEdges: DataFrame, removedEdges: DataFrame,
                             maxIter: Int = 30,
                             checkpointDir: Option[String] = None): DataFrame = {
    // Old cone edges: one keyed pass over the store; distinct on the
    // cone only. (An old edge's endpoints share a prior label, so the
    // lo-side membership test finds every cone edge.)
    val coneExtract = (coneNodes: DataFrame) =>
      oldEdges.select(col("d1").as("a"), col("d2").as("b"))
        .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("lo"),
          greatest(col("a"), col("b")).as("hi"))
        .join(coneNodes, col("lo") === col("doc"), "left_semi")
        .distinct()
    ccIncCore(prior, undirected(addedEdges), undirected(removedEdges),
      coneExtract, maxIter, checkpointDir)
  }

  /** `(d1, d2)` → canonical undirected `(lo, hi)` pairs: nulls and self
    * loops drop, both orientations fold, duplicates collapse. */
  private def undirected(df: DataFrame): DataFrame = df
    .select(col("d1").as("a"), col("d2").as("b"))
    .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    .select(least(col("a"), col("b")).as("lo"),
      greatest(col("a"), col("b")).as("hi"))
    .distinct()

  /** The affected-cone fold shared by [[connectedComponentsInc]] and
    * [[graft.streaming.ClusterLoop]] (whose edge store is SIGNED, so it
    * supplies its own cone extraction). `addU`/`remU` are canonical
    * `(lo, hi)` batch frames; `coneOldEdges` maps a one-column `doc`
    * frame of cone nodes to the OLD graph's canonical edges with
    * `lo` in that set — implementations must restrict the store BEFORE
    * any wide operation (the cone, not the store, pays the distinct/
    * netting shuffle). Idempotent under re-applied batches: re-adding a
    * present edge and re-removing an absent one are no-ops, so a crash
    * replay that folds the same batch against an already-updated store
    * reaches identical labels. */
  private[graft] def ccIncCore(prior: DataFrame, addU0: DataFrame,
                               remU0: DataFrame,
                               coneOldEdges: DataFrame => DataFrame,
                               maxIter: Int = 30,
                               checkpointDir: Option[String] = None): DataFrame = {
    val addU = addU0.localCheckpoint()
    // Remove+re-add in one batch cancels BEFORE touching anything.
    val remNet = remU0.join(addU, Seq("lo", "hi"), "left_anti")
      .localCheckpoint()
    val frontier = addU.select(col("lo").as("n"))
      .union(addU.select(col("hi").as("n")))
      .union(remNet.select(col("lo").as("n")))
      .union(remNet.select(col("hi").as("n"))).distinct().localCheckpoint()
    // Affected component labels (batch-scale; broadcast the frontier).
    val affected = prior
      .join(broadcast(frontier), col("doc") === col("n"), "left_semi")
      .select(col("label")).distinct().localCheckpoint()
    // Cone nodes: members of affected components + brand-new endpoints.
    val coneNodes = prior
      .join(broadcast(affected.select(col("label").as("__al"))),
        col("label") === col("__al"), "left_semi")
      .select(col("doc"))
      .union(frontier.join(prior, col("n") === col("doc"), "left_anti")
        .select(col("n").as("doc")))
      .distinct().localCheckpoint()
    val newCone = coneOldEdges(coneNodes)
      .join(remNet, Seq("lo", "hi"), "left_anti")
      .unionAll(addU)
    val sub = connectedComponents(
      newCone.select(col("lo").as("d1"), col("hi").as("d2")),
      maxIter, checkpointDir)
    val riding = prior.join(broadcast(affected), Seq("label"), "left_anti")
      .select(col("doc"), col("label"))
    riding.unionByName(sub)
  }

  /** Bit `j` (0..15) of md5(w)'s first 16 bits, as 0/1 — integer math only
    * (conv(hex,16,10) replaces charindex; floor-division extracts the bit). */
  private def md5Bit(w: Column, j: Column): Column = {
    val hexChar = md5(w).substr(lit(1) + floor(j / 4).cast("int"), lit(1))
    val hexVal  = conv(hexChar, 16, 10).cast("int")
    floor(hexVal / pow(lit(2), j % 4)).cast("int") % 2
  }

  /** `nBits`-bit SimHash per doc over a (doc_id, w) token relation: each
    * (distinct token, bit) votes ±1; the bit is set when votes are positive.
    * Two hash-partitioned aggregations, both map-side combined. */
  def simhash(tokens: DataFrame, nBits: Int = 16): DataFrame = {
    val js = tokens.sparkSession.range(0, nBits)
      .select(col("id").cast("int").as("j"))
    val votes = tokens.crossJoin(js)
      .groupBy("doc_id", "j")
      .agg(sum(when(md5Bit(col("w"), col("j")) === 1, 1).otherwise(-1)).as("s"))
    votes.groupBy("doc_id")
      .agg(sum(when(col("s") > 0, pow(lit(2), col("j")).cast("bigint"))
        .otherwise(lit(0L))).cast("bigint").as("simhash"))
  }
}
