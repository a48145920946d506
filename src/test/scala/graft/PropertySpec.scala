package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MinHashAgg
import graft.verify.Canon

/** Pure-algebra properties (no Spark session needed): the canonical float
  * rendering, the 48-bit hash, and the MinHash sketch's monoid laws —
  * merge-correctness is what makes the sketch distributable. */
class PropertySpec extends AnyFunSuite {

  /** Deterministic scalacheck sampling (no scalatestplus bridge in deps). */
  private def forAll[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private def forAll3[A](g: Gen[A])(f: (A, A, A) => Unit): Unit =
    forAll(Gen.zip(g, g, g))(t => f(t._1, t._2, t._3))

  test("canonVal renders doubles with exactly 4 decimals, within half-ulp of the value") {
    forAll(Gen.choose(-1e9, 1e9)) { d =>
      val s = Canon.canonVal(d)
      assert(s.matches("-?\\d+\\.\\d{4}"))
      assert(math.abs(s.toDouble - d) <= 5.0001e-5)
    }
  }

  test("canonVal half-even pins (C printf parity on binary-exact half points)") {
    assert(Canon.canonVal(0.15625) == "0.1562")
    assert(Canon.canonVal(0.65625) == "0.6562")
    assert(Canon.canonVal(0.21875) == "0.2188")
    assert(Canon.canonVal(-0.15625) == "-0.1562")
  }

  test("hash48 stays in [0, 2^48) and is seed-sensitive") {
    forAll2(Gen.alphaNumStr, Gen.choose(1, 64)) { (w, seed) =>
      val h = MinHashAgg.hash48(seed, w)
      assert(h >= 0L && h < (1L << 48))
      assert(MinHashAgg.hash48(seed, w) == h)
    }
    assert(MinHashAgg.hash48(1, "x") != MinHashAgg.hash48(2, "x"))
  }

  test("MinHash merge is a commutative, associative, idempotent monoid") {
    val k = 4
    val agg = new MinHashAgg(k)
    val genBuf: Gen[Array[Long]] =
      Gen.listOfN(k, Gen.choose(0L, (1L << 48) - 1)).map(_.toArray)
    forAll3(genBuf) { (a, b, c) =>
      def m(x: Array[Long], y: Array[Long]) = agg.merge(x.clone(), y.clone())
      assert(m(a, b).toSeq == m(b, a).toSeq)                       // commutative
      assert(m(m(a, b), c).toSeq == m(a, m(b, c)).toSeq)           // associative
      assert(m(a, a).toSeq == a.toSeq)                             // idempotent
      assert(m(a, agg.zero).toSeq == a.toSeq)                      // identity
    }
  }

  test("reduce order does not change the sketch (fold = any permutation)") {
    val agg = new MinHashAgg(4)
    forAll(Gen.listOf(Gen.alphaNumStr).map(_.take(30))) { ws =>
      val f = ws.foldLeft(agg.zero.clone())((b, w) => agg.reduce(b, (0L, w)))
      val r = ws.reverse.foldLeft(agg.zero.clone())((b, w) => agg.reduce(b, (0L, w)))
      assert(f.toSeq == r.toSeq)
    }
  }
}
