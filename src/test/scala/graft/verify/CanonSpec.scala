package graft.verify

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the canonicalizer — must stay bit-identical to
  * verification/t2_canon.py (SURVEY.md Appendix B). */
class CanonSpec extends AnyFunSuite {

  test("scalar rendering") {
    assert(Canon.canonVal(null) == "NULL")
    assert(Canon.canonVal(true) == "true")
    assert(Canon.canonVal(false) == "false")
    assert(Canon.canonVal(42) == "42")
    assert(Canon.canonVal(42L) == "42")
    assert(Canon.canonVal(1.5) == "1.5000")
    assert(Canon.canonVal(1.00005) == "1.0000" || Canon.canonVal(1.00005) == "1.0001")
    assert(Canon.canonVal(new java.math.BigDecimal("3.14")) == "3.1400")
  }

  test("negative values rounding to zero keep the sign, like C printf") {
    assert(Canon.canonVal(-0.0) == "-0.0000")
    assert(Canon.canonVal(-0.00001) == "-0.0000")  // python: '%.4f' % -1e-5
    assert(Canon.canonVal(-1e-12) == "-0.0000")
    assert(Canon.canonVal(0.00001) == "0.0000")
    assert(Canon.canonVal(-0.00006) == "-0.0001")  // rounds away from zero
  }

  test("temporal rendering: 6-digit micros, dates as midnight") {
    val t = java.time.LocalDateTime.of(1997, 1, 2, 3, 4, 5, 123456000)
    assert(Canon.canonVal(t) == "1997-01-02 03:04:05.123456")
    val d = java.time.LocalDate.of(1997, 1, 2)
    assert(Canon.canonVal(d) == "1997-01-02 00:00:00.000000")
  }

  test("arrays render recursively; rows join with |") {
    assert(Canon.canonVal(Seq(1, 2, 3)) == "[1,2,3]")
    assert(Canon.canonVal(Seq(1.0, null)) == "[1.0000,NULL]")
  }

  test("hash is first 16 hex of sha256 over newline-joined lines") {
    // sha256("a\nb") = 08f5e05... (precomputed reference)
    assert(Canon.sha16(Seq("a", "b")) ==
      java.security.MessageDigest.getInstance("SHA-256")
        .digest("a\nb".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16))
  }
}
