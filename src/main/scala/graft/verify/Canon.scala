package graft.verify

import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.util.Locale

import org.apache.spark.sql.{DataFrame, Row}

/** Canonical result rendering — Scala port of `verification/t2_canon.py`
  * (SURVEY.md §2.3 / Appendix B). Must stay bit-identical to that reference:
  * NULL for null; true/false; integers as decimal text; all floats and
  * decimals via %.4f; timestamps as `YYYY-MM-DD HH:MM:SS.ffffff` (6-digit
  * micros); dates as midnight timestamps; arrays bracketed recursively.
  * Cells joined by `|`, one line per row, hash = first 16 hex chars of
  * sha256 over newline-joined lines.
  */
object Canon {

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS", Locale.US)

  /** Python's `'%.4f' % v` (C printf): round the EXACT binary expansion of
    * the double, half-to-even, at 4 decimals. Java's `%.4f` instead rounds
    * HALF_UP, which diverges on binary-exact half points (e.g. 0.15625 →
    * Java "0.1563", C "0.1562") — observed on q66 and fixed here so the
    * Scala gate is bit-compatible with the python oracle hashes. */
  private def py4(d: Double): String =
    if (d.isNaN) "nan"
    else if (d.isInfinity) { if (d > 0) "inf" else "-inf" }
    else if (d == 0.0 && java.lang.Double.doubleToRawLongBits(d) != 0L) "-0.0000"
    else {
      val s = new java.math.BigDecimal(d)
        .setScale(4, java.math.RoundingMode.HALF_EVEN)
      // C/printf keeps the sign when a negative value rounds to zero
      // ("-0.0000"); BigDecimal normalizes it away.
      if (d < 0.0 && s.signum == 0) "-0.0000" else s.toPlainString
    }

  def canonVal(v: Any): String = v match {
    case null                      => "NULL"
    case b: Boolean                => if (b) "true" else "false"
    case b: Byte                   => b.toString
    case s: Short                  => s.toString
    case i: Int                    => i.toString
    case l: Long                   => l.toString
    case f: Float                  => py4(f.toDouble)
    case d: Double                 => py4(d)
    case d: java.math.BigDecimal   => py4(d.doubleValue)
    case d: scala.math.BigDecimal  => py4(d.doubleValue)
    case t: java.time.LocalDateTime => tsFmt.format(t)
    // Via the instant + explicit UTC, NOT toLocalDateTime: that uses the
    // JVM default zone, which spark.sql.session.timeZone does not set — on
    // a non-UTC machine LTZ results would hash differently from the oracle.
    case t: java.sql.Timestamp     => tsFmt.format(java.time.LocalDateTime.ofInstant(t.toInstant, java.time.ZoneOffset.UTC))
    case t: java.time.Instant      => tsFmt.format(java.time.LocalDateTime.ofInstant(t, java.time.ZoneOffset.UTC))
    case d: java.time.LocalDate    => d.toString + " 00:00:00.000000"
    case d: java.sql.Date          => d.toLocalDate.toString + " 00:00:00.000000"
    case a: scala.collection.Seq[_] => a.map(canonVal).mkString("[", ",", "]")
    case a: Array[_]               => a.map(canonVal).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => canonVal(k) + ":" + canonVal(x) }.sorted.mkString("{", ",", "}")
    case r: Row                    => r.toSeq.map(canonVal).mkString("[", ",", "]")
    case s                         => s.toString
  }

  def canonRow(r: Row): String = r.toSeq.map(canonVal).mkString("|")

  def sha16(lines: Seq[String]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val bytes = md.digest(lines.mkString("\n").getBytes("UTF-8"))
    bytes.map("%02x".format(_)).mkString.take(16)
  }

  /** (hash, rowCount) of a DataFrame in its existing row order. */
  def hashOf(df: DataFrame): (String, Int) = {
    val lines = df.collect().toSeq.map(canonRow)
    (sha16(lines), lines.size)
  }
}
