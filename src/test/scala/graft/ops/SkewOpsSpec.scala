package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("salted join is row-identical to the plain join") {
    val orders = TestSpark.table("orders")
    val customer = TestSpark.table("customer")
      .select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_acctbal"))

    val plain = orders.join(customer, "o_custkey")
      .groupBy("o_custkey").agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val salted = SkewOps.saltedJoin(orders, customer, "o_custkey", 8)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    assert(salted == plain)
  }

  test("hot-key salted join: row-identical, and only the hot dim rows replicate") {
    val orders = TestSpark.table("orders")
    val customer = TestSpark.table("customer")
      .select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_acctbal"))
    val hot = orders.groupBy("o_custkey").count()
      .orderBy(col("count").desc).limit(3)
      .collect().map(_.getLong(0)).toSeq

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("o_custkey").agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val plain = canon(orders.join(customer, "o_custkey"))
    val hotSalted = canon(SkewOps.saltedJoinHot(orders, customer, "o_custkey", 8, hot))
    assert(hotSalted == plain && plain.nonEmpty)

    // Replication really is bounded at |hot|·salts: the salted branch's
    // dim side carries 3·8 rows, not customers·8.
    val dimRows = customer.where(col("o_custkey").isin(hot: _*)).count()
    assert(dimRows == 3)
  }

  test("map-typed fact columns don't break the salt (maps excluded from the hash basis)") {
    import spark.implicits._
    // hash/xxhash64 throw on MapType at analysis — the salt basis must
    // silently skip map columns, not crash.
    val fact = spark.range(100)
      .select(lit(1L).as("k"), lit("same").as("v"),
        map(lit("a"), lit(1)).as("m"))
    val dim = Seq((1L, "dim")).toDF("k", "d")
    val joined = SkewOps.saltedJoin(fact, dim, "k", 8)
    assert(joined.count() == 100)
  }

  test("salt is a pure function of row content: stable across executions and layouts") {
    // The retry-determinism contract: a speculative/retried task must emit
    // the same salts as its twin, regardless of partition layout or row
    // order. Re-execute the same rows under three different layouts; every
    // row's salt must be identical — rand(seed) would fail this (its
    // stream depends on partition index and position).
    val base = spark.range(0, 1000, 1, 8)
      .select(col("id"), (col("id") % 7).cast("string").as("v"))
    def saltsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select(col("id"), SkewOps.saltExpr(df, Nil, 16).as("s"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = saltsOf(base)
    val b = saltsOf(base.repartition(13))          // different layout
    val c = saltsOf(base.orderBy(col("id").desc))  // different order
    assert(a == b && a == c)
    assert(a.values.toSet.size > 4, "salt failed to spread distinct rows")
  }

  test("byte-identical duplicates share a bucket; saltBy spreads them") {
    // Documented contract: content hashing cannot spread exact duplicates.
    val dups = spark.range(100).select(lit(1L).as("k"), lit("same").as("v"))
    val oneBucket = dups.select(SkewOps.saltExpr(dups, Nil, 8).as("s"))
      .distinct().collect()
    assert(oneBucket.length == 1, "identical rows unexpectedly split buckets")
    // The escape hatch: salt by a distinguishing column (a unique id).
    val tagged = spark.range(100).select(lit(1L).as("k"), col("id").as("event_id"))
    val spread = tagged.select(SkewOps.saltExpr(tagged, Seq(col("event_id")), 8).as("s"))
      .distinct().count()
    assert(spread > 4, s"saltBy failed to spread: $spread buckets")
  }

  test("dedup keep decisions are skew-invariant: mega-cluster window equals two-phase agg+join") {
    // One signature holding half the corpus is the worst case for the
    // per-signature window (the whole cluster lands in one partition).
    // Measured at 4M docs (SURVEY §6): the window still beats every
    // two-phase variant 2-3x because it computes signatures once and
    // shuffles once — this test pins that both forms DECIDE identically,
    // so the implementation choice stays a pure performance call.
    val docs = spark.range(2000)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, lit("the mega cluster shared text body"))
          .otherwise(concat(lit("unique text number "), col("id"))).as("text"))
    val viaWindow = DedupOps.minhashDedupKeepFast(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val sk = DedupOps.sigKeysFast(docs, col("doc_id"), col("text"))
    val keep = sk.groupBy("sigkey").agg(min(col("doc_id")).as("keep_id"))
    val viaTwoPhase = sk.join(keep, "sigkey")
      .select(col("doc_id"), col("keep_id"),
        (col("doc_id") =!= col("keep_id")).as("is_dup"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(viaWindow == viaTwoPhase && viaWindow.size == 2000)
    // Mega cluster: every even doc but 0 is a dup of doc 0 (tiny 4-token
    // "unique" docs may add extra signature collisions on top).
    assert((0L until 2000L by 2).forall(d => viaWindow(d) == (0L, d != 0L)))
    assert(viaWindow.count(_._2._2) >= 999)
  }

  test("salt actually widens the shuffle key (hot keys spread n ways)") {
    val orders = TestSpark.table("orders")
    val customer = TestSpark.table("customer")
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    // Disable auto-broadcast so the join shuffles and the salt matters.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = SkewOps.saltedJoin(orders, customer, "o_custkey", 8)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__graft_salt"), s"salt missing from plan:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
