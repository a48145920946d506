package graft

import java.nio.file.{Files, Paths}

/** Dev tooling: dump `SparkEntry.oracleSql` as oracle_sql.json WITHOUT
  * executing the queries ([[Verify]] writes the same file only after
  * running the full 170-query suite — far too slow for iterating on one
  * new query's DuckDB twin). Same JSON escaping as Verify.
  *
  * Usage: runMain graft.OracleDump <outPath>
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/oracle_sql.json"
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${SparkEntry.oracleSql.size} oracle entries to $out")
  }
}
