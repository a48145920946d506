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

  def canonVal(v: Any): String = v match {
    case null                      => "NULL"
    case b: Boolean                => if (b) "true" else "false"
    case b: Byte                   => b.toString
    case s: Short                  => s.toString
    case i: Int                    => i.toString
    case l: Long                   => l.toString
    case f: Float                  => "%.4f".formatLocal(Locale.US, f.toDouble)
    case d: Double                 => "%.4f".formatLocal(Locale.US, d)
    case d: java.math.BigDecimal   => "%.4f".formatLocal(Locale.US, d.doubleValue)
    case d: scala.math.BigDecimal  => "%.4f".formatLocal(Locale.US, d.doubleValue)
    case t: java.time.LocalDateTime => tsFmt.format(t)
    case t: java.sql.Timestamp     => tsFmt.format(t.toLocalDateTime)
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
