package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The distributed BPE trainer must agree with a straightforward
  * in-memory reference implementation of the classic algorithm, and the
  * encoder must replay trained merges faithfully. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Pure-Scala reference trainer: same vocabulary collapse, same
    * max-count / lexicographic-tie-break selection, same leftmost-first
    * merge application. Deliberately naive — the ground truth. */
  private def referenceTrain(words: Seq[String], numMerges: Int,
                             minPairCount: Long = 2L): Seq[(String, String)] = {
    var vocab: Map[IndexedSeq[String], Long] = words.groupBy(identity)
      .map { case (w, ws) => Bpe.toSymbols(w) -> ws.size.toLong }
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some((pair, c)) if c >= minPairCount =>
          merges += pair
          vocab = vocab.groupMapReduce(
            { case (syms, _) => Bpe.mergeOnce(syms, pair._1, pair._2) })(
            _._2)(_ + _)
        case _ => continue = false
      }
    }
    merges.toList
  }

  private def corpusDf(words: Seq[String]) = {
    import spark.implicits._
    Seq(words.mkString(" ")).toDF("text")
  }

  test("trainer matches the reference on the classic low/lower/newest corpus") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val expect = referenceTrain(words, 10)
    val got = Bpe.train(corpusDf(words), col("text"), 10)
    assert(got == expect, s"got $got\nexpect $expect")
    assert(got.nonEmpty && got.contains(("e", "s")), s"es merge missing: $got")
  }

  test("trainer matches the reference on fixture documents") {
    val docs = TestSpark.table("documents").where(col("doc_id") < 40)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").collect().map(_.getString(0)).toSeq
    val expect = referenceTrain(words, 30)
    val got = Bpe.train(docs, col("text"), 30)
    assert(got == expect)
    assert(got.size == 30, "fixture corpus supports 30 merges")
  }

  test("batched merge rounds: identical merge list, fewer Spark rounds") {
    val docs = TestSpark.table("documents").where(col("doc_id") < 40)
    val (seqMerges, seqRounds) = Bpe.trainWithStats(docs, col("text"), 30, batchK = 1)
    val (batMerges, batRounds) = Bpe.trainWithStats(docs, col("text"), 30, batchK = 8)
    assert(batMerges == seqMerges, "batching changed the merge sequence")
    assert(seqRounds == 30)
    assert(batRounds < seqRounds, s"batching saved no rounds: $batRounds")
    info(s"30 merges: $seqRounds sequential rounds vs $batRounds batched")
    // And on the classic corpus too.
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val (sm, _) = Bpe.trainWithStats(corpusDf(words), col("text"), 10, batchK = 1)
    val (bm, _) = Bpe.trainWithStats(corpusDf(words), col("text"), 10, batchK = 8)
    assert(bm == sm)
  }

  test("selectBatch: conflicting pair stops the batch, strict-count truncation holds") {
    // d/e conflict with the accepted (d,e)? no — (c,d) shares d with (d,e).
    val sorted = IndexedSeq(
      ("a", "b", 10L), ("c", "d", 8L), ("e", "f", 8L), ("d", "g", 8L), ("h", "i", 7L))
    // (d,g) shares d with accepted (c,d): batch stops there; accepted with
    // count strictly > 8 survive — only (a,b).
    assert(Bpe.selectBatch(sorted, want = 8, minPairCount = 2L, fetchComplete = true)
      == Seq(("a", "b")))
    // Without the conflict the whole disjoint list is safe.
    val clean = IndexedSeq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 6L))
    assert(Bpe.selectBatch(clean, want = 8, minPairCount = 2L, fetchComplete = true)
      == Seq(("a", "b"), ("c", "d"), ("e", "f")))
    // Truncated fetch: unseen pairs bound the batch by the last count.
    assert(Bpe.selectBatch(clean, want = 8, minPairCount = 2L, fetchComplete = false)
      == Seq(("a", "b"), ("c", "d")))
    // Merged-symbol collision: (ab, x) involves the symbol a+b created by
    // the first merge — must not be batched with it.
    val collide = IndexedSeq(("a", "b", 10L), ("ab", "x", 4L))
    assert(Bpe.selectBatch(collide, want = 8, minPairCount = 2L, fetchComplete = true)
      == Seq(("a", "b")))
  }

  test("encode replays merges: tokens reconstruct the word, counts are exact") {
    import spark.implicits._
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val merges = Bpe.train(corpusDf(words), col("text"), 8)
    val docs = Seq((1L, "low lower"), (2L, "newest widest lowest"),
      (3L, null.asInstanceOf[String]), (4L, "")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, col("doc_id"), col("text"), merges)
      .orderBy("doc_id").collect()
    // Lossless: concatenating a word's tokens (minus the marker) gives the
    // word back, for trained AND unseen words ("lowest").
    val row2 = out(1).getSeq[String](1)
    assert(row2.mkString.replace(Bpe.EndOfWord, "") == "newestwidestlowest")
    assert(out(0).getInt(2) == out(0).getSeq[String](1).length)
    // Null and empty text tokenize to zero tokens, not errors.
    assert(out(2).getInt(2) == 0 && out(3).getInt(2) == 0)
    // A fully-merged frequent word is ONE token; the unseen "lowest" still
    // shares learned stems so it beats character count.
    val lowTokens = Bpe.encode(Seq((9L, "low")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), merges).head().getSeq[String](1)
    assert(lowTokens == Seq("low" + Bpe.EndOfWord) || lowTokens.length <= 2,
      s"'low' should be (nearly) fully merged: $lowTokens")
  }

  test("encode is a narrow map — no shuffle, deterministic") {
    val docs = TestSpark.table("documents").where(col("doc_id") < 40)
    val merges = Bpe.train(docs, col("text"), 15)
    val enc = Bpe.encode(docs, col("doc_id"), col("text"), merges)
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"))
    val a = enc.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    val b = Bpe.encode(docs, col("doc_id"), col("text"), merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    assert(a == b)
    // Token counts are bounded by character counts and at least word counts.
    val chars = docs.select(sum(length(regexp_replace(col("text"), " ", "")))).head().getLong(0)
    val wordsN = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    val total = a.map(_._2.toLong).sum
    assert(total <= chars + wordsN && total >= wordsN, s"total=$total")
  }

  test("byte arrangement: 256-way bijection, GPT-2 anchor points") {
    // Bijective: every byte maps to a distinct char and back.
    assert(Bpe.byteToChar.distinct.length == 256)
    (0 until 256).foreach(b => assert(Bpe.charToByte(Bpe.byteToChar(b)) == b))
    // Published anchors: printable ASCII is identity; the first
    // non-printable byte (0x00) takes code point 256, space (0x20) is
    // non-printable and maps to 'Ġ' (0x120) — the familiar GPT-2 glyph.
    assert(Bpe.byteToChar('A'.toInt) == 'A' && Bpe.byteToChar(0) == 256.toChar)
    assert(Bpe.byteToChar(' '.toInt) == 'Ġ')
  }

  test("byte-level round-trip: astral + mixed-script text, no OOV, no shuffle") {
    import spark.implicits._
    // Train on plain English; encode text in scripts training NEVER saw —
    // CJK, Cyrillic, an astral emoji (surrogate pair), combining marks.
    val words = Seq.fill(6)("low") ++ Seq.fill(4)("lower") ++ Seq.fill(5)("newest")
    val merges = Bpe.train(corpusDf(words), col("text"), 8, byteLevel = true)
    val wild = "低い 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 низкий lów 🐫 newest"
    val docs = Seq((1L, wild), (2L, "low lower")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, col("doc_id"), col("text"), merges, byteLevel = true)
    // Still a narrow map — the byte arrangement must not add an Exchange.
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"))
    val out = enc.orderBy("doc_id").collect()
    // LOSSLESS decode for arbitrary unicode — the base alphabet is the
    // 256 byte stand-ins, so no symbol can fall outside the vocabulary.
    assert(Bpe.decodeByteLevel(out(0).getSeq[String](1)) == wild)
    assert(Bpe.decodeByteLevel(out(1).getSeq[String](1)) == "low lower")
    // Every emitted base symbol is drawn from the known alphabet (strip
    // the end marker, then check each char inverts).
    out.flatMap(_.getSeq[String](1)).foreach { tok =>
      tok.replace(Bpe.EndOfWord, "").foreach(c =>
        assert(Bpe.charToByte.contains(c), s"unknown base symbol in $tok"))
    }
    // The char-level path would shatter the astral camel into lone
    // surrogates; byte-level yields 4 valid UTF-8 byte symbols.
    val camel = Bpe.encodeWord("🐫", Map.empty, byteLevel = true)
    assert(camel.length == 5 && camel.last == Bpe.EndOfWord) // 4 bytes + marker
    // Trained merges still bite on in-distribution words.
    val lowTokens = Bpe.encodeWord("low", merges.zipWithIndex.toMap, byteLevel = true)
    assert(lowTokens.length <= 2, s"'low' should be (nearly) fully merged: $lowTokens")
  }
}
