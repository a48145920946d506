package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL byte-pair-encoding tokenizer: a distributed trainer and a
  * broadcast-ranks encoder — the token-counting operator a training-data
  * pipeline actually runs (the regex "BPE-ish" count in q52 estimates
  * token budgets; this produces the tokens).
  *
  * Training is the classic word-level algorithm (Sennrich et al. 2016, the
  * GPT-2 arrangement): the corpus is first collapsed to a (word, count)
  * VOCABULARY — one hash agg, after which every iteration's cost scales
  * with the number of DISTINCT words, not corpus bytes (the standard
  * trick that makes BPE training tractable at corpus scale; cap the long
  * tail with `minWordCount`). Each merge round is two small Spark jobs
  * over the vocabulary: a weighted pair count (explode + hash agg) and a
  * narrow merge map. Lineage is cut with `localCheckpoint` every
  * `cutEvery` rounds so plan depth stays bounded across hundreds of
  * merges.
  *
  * Encoding is embarrassingly parallel: the learned merge table broadcasts
  * as a rank map and each document tokenizes independently in one narrow
  * `mapPartitions` — no shuffle, no state.
  */
object Bpe {

  /** End-of-word marker (keeps word-final merges distinct from mid-word
    * ones, per the original formulation). */
  val EndOfWord = "</w>"

  /** Greedily merge every non-overlapping (a, b) occurrence, leftmost
    * first — the exact application order training uses, so encode replays
    * training merges faithfully. */
  private[ops] def mergeOnce(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Word → initial symbol sequence: characters plus the end marker. */
  private[ops] def toSymbols(w: String): IndexedSeq[String] =
    w.map(_.toString).toIndexedSeq :+ EndOfWord

  // ---- byte-level arrangement (round 9) ------------------------------
  //
  // Char-level symbols have two robustness holes at encode time: an
  // ASTRAL code point splits into two lone UTF-16 surrogates (each an
  // unpaired half-character token), and any script unseen in training
  // yields base symbols a downstream token→id vocabulary has never
  // assigned (OOV). The GPT-2 arrangement closes both: decompose each
  // word to UTF-8 BYTES and map every byte to a fixed printable unicode
  // char — the base alphabet is exactly 256 known symbols, so arbitrary
  // text always encodes, and the mapping is invertible so decode is
  // lossless. Printable bytes map to themselves; the rest take
  // consecutive code points from 256 up (the published GPT-2 table,
  // reproduced from its definition, not its data file).

  /** byte (0–255) → stand-in char: identity on the three printable
    * ranges `!..~`, `¡..¬`, `®..ÿ`; remaining bytes get 256+n in byte
    * order. */
  private[ops] val byteToChar: Array[Char] = {
    val printable =
      (('!'.toInt to '~'.toInt) ++ ('¡'.toInt to '¬'.toInt) ++
        ('®'.toInt to 'ÿ'.toInt)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  private[ops] val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Word → byte-level symbol sequence: one stand-in char per UTF-8
    * byte, plus the end marker. Never OOV, never splits a surrogate. */
  private[ops] def toByteSymbols(w: String): IndexedSeq[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => byteToChar(b & 0xff).toString).toIndexedSeq :+ EndOfWord

  /** Invert a byte-level token stream back to text: concatenate symbol
    * chars, cut words at the end markers, map stand-in chars back to
    * bytes, decode UTF-8, rejoin with single spaces (the encoder's word
    * split normalizes whitespace runs, so that is the fixed point). */
  def decodeByteLevel(tokens: Seq[String]): String =
    tokens.mkString("")
      .split(java.util.regex.Pattern.quote(EndOfWord), -1)
      .iterator.filter(_.nonEmpty)
      .map { seg =>
        new String(seg.map(c => charToByte(c).toByte).toArray,
          java.nio.charset.StandardCharsets.UTF_8)
      }
      .mkString(" ")

  /** The batch of merges provably safe to apply in ONE round, given the
    * round's pair counts in `(count desc, a, b)` order: the maximal
    * pairwise SYMBOL-DISJOINT prefix, truncated to counts STRICTLY above
    * the first conflicting (or first unfetched) pair's count.
    *
    * Why this replays the sequential algorithm exactly: merging a pair can
    * only (i) leave a symbol-disjoint pair's count unchanged, (ii) shrink
    * a symbol-sharing neighbor's count, or (iii) create new pairs
    * involving the merged symbol — and a new pair `(x, ab)`'s count is
    * bounded by the STATIC count of the neighbor `(x, a)` (every
    * occurrence of x·ab was an occurrence of x·a). Accepted pairs are
    * disjoint (so (i) applies among them) and each accepted count strictly
    * exceeds every non-accepted/neighbor count (so nothing from (ii)/(iii)
    * can overtake or tie one) — the sequential trainer would pick exactly
    * these pairs, in exactly this order. Pairs under `minPairCount` are
    * ignorable bounds: their neighbors' new pairs stay under the threshold
    * too. */
  private[ops] def selectBatch(sorted: IndexedSeq[(String, String, Long)],
                               want: Int, minPairCount: Long,
                               fetchComplete: Boolean): Seq[(String, String)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val acc = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    var bound = Option.empty[Long]
    var belowThreshold = false
    var i = 0
    while (i < sorted.length && acc.size < want && bound.isEmpty && !belowThreshold) {
      val (a, b, c) = sorted(i)
      if (c < minPairCount) belowThreshold = true
      else if (used(a) || used(b)) bound = Some(c)
      else { acc += ((a, b, c)); used ++= Set(a, b, a + b); i += 1 }
    }
    val cut = bound.orElse {
      if (belowThreshold) None // everything past here is sub-threshold forever
      else if (i < sorted.length) Some(sorted(i)._3) // capped at `want`
      else if (!fetchComplete) Some(sorted.last._3) // unseen pairs <= last fetched
      else None // scanned the complete pair list, all accepted
    }
    acc.toSeq.collect { case (a, b, c) if cut.forall(c > _) => (a, b) }
  }

  /** Train `numMerges` BPE merges over the corpus. Deterministic: the best
    * pair each round is the highest weighted count, ties broken by the
    * lexicographically smallest (a, b) in Spark's UTF8 binary order (=
    * code-point order; JVM String.compareTo differs for supplementary
    * characters — the tie-break is deterministic either way, just pinned
    * to the engine's ordering). Stops early when no pair occurs at least
    * `minPairCount` times (further merges would memorize noise).
    *
    * Each Spark round applies up to `batchK` merges (the provably-safe
    * batch of [[selectBatch]] — the result is IDENTICAL to one-merge-per-
    * round training, BpeSpec pins it), cutting driver round-trips for
    * large vocabularies; at least one merge always applies per round.
    *
    * Returns merges in training order — position IS the rank the encoder
    * uses. */
  def train(docs: DataFrame, text: Column, numMerges: Int,
            minWordCount: Long = 1L, minPairCount: Long = 2L,
            cutEvery: Int = 20, batchK: Int = 8,
            byteLevel: Boolean = false): Seq[(String, String)] =
    trainWithStats(docs, text, numMerges, minWordCount, minPairCount,
      cutEvery, batchK, byteLevel)._1

  /** [[train]] plus the number of Spark rounds it took (for batching
    * diagnostics/specs). `byteLevel = true` trains over the byte
    * arrangement ([[toByteSymbols]]) — pair it with the same flag at
    * encode time. */
  def trainWithStats(docs: DataFrame, text: Column, numMerges: Int,
                     minWordCount: Long = 1L, minPairCount: Long = 2L,
                     cutEvery: Int = 20, batchK: Int = 8,
                     byteLevel: Boolean = false): (Seq[(String, String)], Int) = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(batchK > 0, s"batchK must be positive, got $batchK")
    val spark = docs.sparkSession
    import spark.implicits._
    val symbolize: String => IndexedSeq[String] =
      if (byteLevel) toByteSymbols else toSymbols
    var vocab: Dataset[(IndexedSeq[String], Long)] = docs
      .select(explode(TextOps.tokens(text)).as("w"))
      .where(col("w").isNotNull && col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .where(col("n") >= minWordCount)
      .as[(String, Long)]
      .map { case (w, n) => (symbolize(w), n) }
    vocab = vocab.localCheckpoint() // the expensive corpus agg runs ONCE
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var rounds = 0
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val want = math.min(batchK, numMerges - merges.size)
      val fetch = want * 2 + 8
      val top = vocab
        .flatMap { case (syms, n) =>
          if (syms.length < 2) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, n))
        }
        .toDF("a", "b", "n")
        .groupBy("a", "b").agg(sum("n").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .head(fetch)
      rounds += 1
      if (top.isEmpty || top(0).getLong(2) < minPairCount) exhausted = true
      else {
        val sorted = top.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toIndexedSeq
        val safe = selectBatch(sorted, want, minPairCount, top.length < fetch)
        // The head pair alone is always the correct next merge (the plain
        // sequential step) — guarantees progress when truncation empties
        // the batch.
        val batch = if (safe.nonEmpty) safe else Seq((sorted.head._1, sorted.head._2))
        merges ++= batch
        vocab = vocab.map { case (syms, n) =>
          (batch.foldLeft(syms) { case (s, (a, b)) => mergeOnce(s, a, b) }, n)
        }
        // Bounded plan depth: each round chains a narrow map; cut the
        // lineage before analysis cost compounds across hundreds of rounds.
        if (rounds % math.max(cutEvery, 1) == 0) vocab = vocab.localCheckpoint()
      }
    }
    (merges.toList, rounds)
  }

  /** Tokenize one word with a trained rank map: start from characters and
    * repeatedly apply the LOWEST-rank applicable merge until none applies
    * — the standard BPE encode loop. */
  private[ops] def encodeWord(w: String, ranks: Map[(String, String), Int],
                              byteLevel: Boolean = false): IndexedSeq[String] = {
    var syms = if (byteLevel) toByteSymbols(w) else toSymbols(w)
    var done = w.isEmpty
    while (!done && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) done = true
      else syms = mergeOnce(syms, bestPair._1, bestPair._2)
    }
    syms
  }

  /** Tokenize documents with a trained merge list:
    * (id, tokens array<string>, n_tokens). The merge table broadcasts as a
    * rank map; tokenization is one narrow mapPartitions — no shuffle, and
    * token COUNTS (the budget signal q52 approximates) are now exact under
    * the learned vocabulary. Null/empty text yields zero tokens. */
  def encode(docs: DataFrame, id: Column, text: Column,
             merges: Seq[(String, String)],
             byteLevel: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranksB = spark.sparkContext.broadcast(
      merges.iterator.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    docs.select(id.cast("long").as("doc_id"), text.cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val ranks = ranksB.value
        rows.map { case (docId, t) =>
          val toks: Seq[String] =
            if (t == null || t.isEmpty) Nil
            else t.split(" ").iterator.filter(_.nonEmpty)
              .flatMap(w => encodeWord(w, ranks, byteLevel)).toSeq
          (docId, toks, toks.length)
        }
      }
      .toDF("doc_id", "tokens", "n_tokens")
  }
}
