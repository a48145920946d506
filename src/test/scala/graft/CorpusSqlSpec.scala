package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.verify.Canon

/** E1-surface gate: every declared query's SPARK-dialect SQL string must
  * execute and produce the exact canonical hash of the DataFrame impl that
  * shadows it (which is itself oracle-gated at sf0.01) — otherwise the SQL
  * half of the contract is dead text nothing ever runs. */
class CorpusSqlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Documented dialect split (Corpus.scala q72 comment): Spark 4.1 rejects
    * UNION (distinct) in recursive CTEs, and UNION ALL cannot terminate on a
    * symmetric edge set — q72's Spark-side lowering is the iterative
    * DedupOps.connectedComponents kernel instead of one SQL text. */
  private val iterativeOnly = Set("q72_dup_components", "q189_netted_components")

  for (c <- Corpus.all if !iterativeOnly(c.name)) {
    test(s"${c.name}: spark-dialect SQL ≡ DataFrame impl") {
      spark // force catalog registration via TestSpark
      val (sqlHash, sqlRows) = Canon.hashOf(spark.sql(c.sparkSql))
      val (dfHash, dfRows) = Canon.hashOf(TestSpark.corpus(c.name))
      assert(sqlRows == dfRows, s"row counts differ: sql=$sqlRows df=$dfRows")
      assert(sqlHash == dfHash, s"canonical hashes differ: sql=$sqlHash df=$dfHash")
    }
  }

  for (name <- iterativeOnly)
    test(s"$name: Spark still rejects union-distinct recursive CTEs (re-enable the SQL text when lifted)") {
      spark
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(Corpus.byName(name).sparkSql).collect()
      }
      assert(e.getMessage.contains("UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"),
        s"restriction changed — revisit the $name dialect split: ${e.getMessage.take(200)}")
    }
}
