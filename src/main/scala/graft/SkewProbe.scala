package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Diagnosis probe (not driver contract): the q92 hot-span skew at scale,
  * and WHEN salting actually pays.
  *
  * Fixture: `n` docs, every one sharing the same 20-word boilerplate
  * span (the corpus-wide-header shape) plus one more span drawn from a
  * pool of `pool` distinct texts. `pool` controls the keeper-table size
  * relative to the fact side — the deciding ratio, because the salted
  * join replicates the keeper `salts`×:
  *
  *  - pool = n (every tail span unique): keeper ≈ fact, replication
  *    dominates, salting LOSES locally despite fixing the imbalance;
  *  - pool ≪ n (boilerplate-heavy corpus, the shape q92 targets):
  *    keeper is tiny, replication is free, salting wins the straggler.
  *
  * Prints wall-clock (warm second run), dup counts (must agree), and
  * the max per-partition row count of the result — the imbalance is
  * measured, not inferred.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val pools = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(n, 1000)
    val spark = graft.engine.Graft.session("graft-skewprobe")

    val hot = (1 to 20).map(i => s"w$i").mkString(" ")
    def mkDocs(pool: Int) = {
      val d = spark.range(n).select(col("id").as("doc_id"),
        concat(lit(hot + " "),
          concat_ws(" ", (1 to 20).map(i => concat(lit(s"u${i}_"), pmod(col("id"), lit(pool)))): _*))
          .as("text")).persist()
      d.count(); d
    }
    def timed(f: () => Long): (Double, Long) = {
      f(); val t0 = System.nanoTime()
      val r = f(); ((System.nanoTime() - t0) / 1e9, r)
    }
    pools.foreach { pool =>
      val docs = mkDocs(pool)
      def dups(salts: Int): Long =
        DedupOps.spanDedup(docs, col("doc_id"), col("text"), salts = salts)
          .where(col("is_dup")).count()
      def maxPartRows(salts: Int): Long =
        DedupOps.spanDedup(docs, col("doc_id"), col("text"), salts = salts)
          .rdd.mapPartitions(it => Iterator.single(it.size.toLong)).collect().max
      val (tPlain, dPlain) = timed(() => dups(0))
      val (tSalted, dSalted) = timed(() => dups(32))
      require(dPlain == dSalted, s"salted decisions diverged: $dPlain vs $dSalted")
      println(f"== pool=$pool%-8d plain  $tPlain%7.2f sec  max_part=${maxPartRows(0)}%-8d dups=$dPlain")
      println(f"== pool=$pool%-8d salt32 $tSalted%7.2f sec  max_part=${maxPartRows(32)}%-8d dups=$dSalted")
      docs.unpersist()
    }
    spark.stop()
  }
}
