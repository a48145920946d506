package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The typed sketch must agree value-for-value with the declared SQL/Column
  * lowering, and its merge must behave like a sketch union. */
class MinHashAggSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("typed MinHash signatures equal the column-based q54 lowering") {
    val toks = DedupOps.tokenSet(TestSpark.table("documents"), col("doc_id"), col("text"))
    val typed = DedupOps.minhashSignaturesTyped(toks, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val column = DedupOps.minhashSignatures(toks, 4)
      .collect().map { r =>
        r.getLong(0) -> (1 to 4).map(i =>
          java.lang.Long.parseLong(r.getString(i), 16)).toVector
      }.toMap
    assert(typed == column)
  }

  test("merge is a sketch union: split corpus halves merge to the whole") {
    val k = 4
    val agg = new MinHashAgg(k)
    val docs = TestSpark.table("documents").select("doc_id", "text").collect()
    val words = docs.flatMap(r => r.getString(1).split(" ").map(w => (r.getLong(0), w)))
    val (l, r) = words.splitAt(words.length / 2)
    def sketch(part: Array[(Long, String)]): Array[Long] =
      part.foldLeft(agg.zero.clone())((b, in) => agg.reduce(b, in))
    val merged = agg.merge(sketch(l), sketch(r))
    val whole = sketch(words)
    assert(merged.toSeq == whole.toSeq)
  }

  test("hash48 matches the SQL md5-prefix lowering") {
    val viaSql = spark.sql("select substr(md5('3:hello'),1,12) h").head().getString(0)
    assert(java.lang.Long.parseLong(viaSql, 16) == MinHashAgg.hash48(3, "hello"))
  }
}
