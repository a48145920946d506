package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.VectorOps

/** The optimizer rule must turn the PORTABLE HOF cosine/dot SQL into the
  * native fused expressions — bit-identically — and must refuse every
  * almost-matching shape. */
class NativeVectorRewriteSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def emb = TestSpark.table("embeddings")

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  /** The exact portable dialect of the declared corpus (Corpus.simOf). */
  private val hofCosine =
    """aggregate(zip_with(a.embedding, b.embedding, (x,y)->cast(x as double)*cast(y as double)), cast(0.0 as double), (acc,x)->acc+x)
       / (sqrt(aggregate(transform(a.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))
        * sqrt(aggregate(transform(b.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x)))"""

  private def pairs = {
    emb.createOrReplaceTempView("e_rw")
    spark.sql(
      s"""select a.vec_id i, b.vec_id j, $hofCosine sim
          from e_rw a join e_rw b on a.vec_id < 8 and b.vec_id between 8 and 40""")
  }

  test("portable HOF cosine SQL gets native kernels, Divide preserved") {
    // The BARE divide must NOT fuse into cosine_sim (Divide's zero-divisor
    // semantics — NULL / ANSI error — differ from the kernel's NaN); its
    // three inner folds go native and the Divide node survives.
    val plan = optimized(pairs)
    assert(plan.contains("dot_f32"), s"no rewrite in:\n$plan")
    assert(!plan.contains("cosine_sim"), s"bare divide illegally fused in:\n$plan")
    assert(!plan.contains("aggregate(zip_with"), s"HOF survived in:\n$plan")
    assert(!plan.contains("aggregate(transform"), s"norm HOF survived in:\n$plan")
  }

  test("rewrite is bit-identical to the native function (and to no-rule eval)") {
    // The same pair set through the explicitly-native path: every double
    // must be bit-equal, unrounded.
    emb.createOrReplaceTempView("e_rw")
    val native = spark.sql(
      """select a.vec_id i, b.vec_id j, cosine_sim(a.embedding, b.embedding) sim
         from e_rw a join e_rw b on a.vec_id < 8 and b.vec_id between 8 and 40""")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rewritten = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rewritten.size == native.size && rewritten.nonEmpty)
    rewritten.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(native(k)), s"bits differ at $k")
    }
  }

  test("VectorOps.cosine (NaN-guarded CaseWhen form) fuses to cosine_sim") {
    val df = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(10)
      .select(VectorOps.cosine(col("a.embedding"), col("b.embedding")).as("s"))
    val plan = optimized(df)
    assert(plan.contains("cosine_sim"), s"guarded cosine not fused in:\n$plan")
    // Fully fused: the guard predicate's norm folds are gone too — no
    // residual dot_f32 norms evaluated twice.
    assert(!plan.contains("dot_f32"), s"residual norm kernels in:\n$plan")
    assert(!plan.contains("CASE WHEN"), s"guard survived in:\n$plan")
  }

  test("standalone HOF dot product rewrites to dot_f32") {
    val df = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(10)
      .select(VectorOps.dot(col("a.embedding"), col("b.embedding")).as("d"))
    val plan = optimized(df)
    assert(plan.contains("dot_f32"), s"no dot rewrite in:\n$plan")
    // And it matches the native function bit-for-bit.
    val viaRule = df.collect().map(_.getDouble(0))
    val viaNative = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(10)
      .select(call_function("dot_f32", col("a.embedding"), col("b.embedding")))
      .collect().map(_.getDouble(0))
    assert(viaRule.map(java.lang.Double.doubleToLongBits).toSeq ==
      viaNative.map(java.lang.Double.doubleToLongBits).toSeq)
  }

  test("standalone norm-squared fold rewrites to dot_f32(a, a), bit-identically") {
    val df = emb.limit(20).select(
      (VectorOps.norm2(col("embedding")) * VectorOps.norm2(col("embedding"))).as("n2"))
    val plan = optimized(df)
    assert(plan.contains("dot_f32"), s"no norm rewrite in:\n$plan")
    val viaRule = df.collect().map(_.getDouble(0))
    val viaNative = emb.limit(20).select(
      (sqrt(call_function("dot_f32", col("embedding"), col("embedding"))) *
        sqrt(call_function("dot_f32", col("embedding"), col("embedding")))).as("n2"))
      .collect().map(_.getDouble(0))
    assert(viaRule.map(java.lang.Double.doubleToLongBits).toSeq ==
      viaNative.map(java.lang.Double.doubleToLongBits).toSeq)
  }

  test("near-miss shapes are NOT rewritten") {
    emb.createOrReplaceTempView("e_rw")
    // Norms of (a, a) under a dot of (a, b): not a cosine — must survive.
    val wrongNorms = spark.sql(
      """select aggregate(zip_with(a.embedding, b.embedding, (x,y)->cast(x as double)*cast(y as double)), cast(0.0 as double), (acc,x)->acc+x)
           / (sqrt(aggregate(transform(a.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))
            * sqrt(aggregate(transform(a.embedding, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))) s
         from e_rw a join e_rw b on a.vec_id < 2 and b.vec_id = 5""")
    assert(!optimized(wrongNorms).contains("cosine_sim"))
    // A sum fold (not a product zip): no dot rewrite.
    val sumFold = spark.sql(
      """select aggregate(zip_with(a.embedding, b.embedding, (x,y)->cast(x as double)+cast(y as double)), cast(0.0 as double), (acc,x)->acc+x) s
         from e_rw a join e_rw b on a.vec_id < 2 and b.vec_id = 5""")
    assert(!optimized(sumFold).contains("dot_f32"))
    // Double arrays (not array<float>): native kernel doesn't apply.
    val doubles = spark.sql(
      """select aggregate(zip_with(cast(a.embedding as array<double>), cast(b.embedding as array<double>), (x,y)->x*y), cast(0.0 as double), (acc,x)->acc+x) s
         from e_rw a join e_rw b on a.vec_id < 2 and b.vec_id = 5""")
    assert(!optimized(doubles).contains("dot_f32"))
    // FLOAT-precision product (no cast on the lambda vars) over
    // array<float>: each product rounds to float before the fold widens
    // it — different bits than the double-product kernel. Must survive.
    val floatProd = spark.sql(
      """select aggregate(zip_with(a.embedding, b.embedding, (x,y)->x*y), cast(0.0 as double), (acc,x)->acc+x) s
         from e_rw a join e_rw b on a.vec_id < 2 and b.vec_id = 5""")
    assert(!optimized(floatProd).contains("dot_f32"),
      s"float-precision product illegally rewritten:\n${optimized(floatProd)}")
    val floatSq = spark.sql(
      """select aggregate(transform(a.embedding, x->x*x), cast(0.0 as double), (acc,x)->acc+x) s
         from e_rw a where a.vec_id < 2""")
    assert(!optimized(floatSq).contains("dot_f32"),
      s"float-precision square illegally rewritten:\n${optimized(floatSq)}")
  }

  test("zero-norm/empty bare-SQL cosine: rewritten plan ≡ rule-disabled plan") {
    import spark.implicits._
    // Degenerate vectors through the BARE portable divide: the rewrite
    // must not change what the user gets (Divide semantics preserved),
    // whether that is a NULL, a NaN, or an ANSI divide-by-zero error.
    val d = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      (1L, Array(1f, 2f), Array(1f, 2f)),           // normal
      (2L, Array(0f, 0f), Array(1f, 2f)),           // zero norm
      (3L, Array.empty[Float], Array.empty[Float])), 2)) // empty
      .toDF("id", "a", "b")
    d.createOrReplaceTempView("deg_rw")
    val bareSql =
      """select id,
           aggregate(zip_with(a, b, (x,y)->cast(x as double)*cast(y as double)), cast(0.0 as double), (acc,x)->acc+x)
           / (sqrt(aggregate(transform(a, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))
            * sqrt(aggregate(transform(b, x->cast(x as double)*cast(x as double)), cast(0.0 as double),(acc,x)->acc+x))) sim
         from deg_rw order by id"""

    def outcome(): Either[String, Seq[(Long, Option[Long])]] =
      try Right(spark.sql(bareSql).collect().toSeq.map(r =>
        (r.getLong(0), if (r.isNullAt(1)) None
          else Some(java.lang.Double.doubleToLongBits(r.getDouble(1))))))
      catch { case e: Exception => Left(e.getClass.getName) }

    val withRule = outcome()
    assert(optimized(spark.sql(bareSql)).contains("dot_f32")) // rule did fire
    val exclKey = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(exclKey)
    spark.conf.set(exclKey, "graft.functions.NativeVectorRewrite")
    try {
      val noRulePlan = optimized(spark.sql(bareSql))
      assert(!noRulePlan.contains("dot_f32") && !noRulePlan.contains("cosine_sim"),
        s"exclusion did not disable the rule:\n$noRulePlan")
      assert(outcome() == withRule,
        "rewritten and rule-disabled plans disagree on degenerate inputs")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(exclKey, v)
        case None => spark.conf.unset(exclKey)
      }
    }
  }

  test("rewrite completeness: every declared SQL using the HOF vector dialect goes native") {
    TestSpark.table("embeddings") // ensure the catalog is registered
    graft.Corpus.all
      // The VECTOR dot-product dialect only: bare zip_with inside an
      // aggregate-fold. q188's map_zip_with is a MAP merge — no vector
      // math to rewrite — and must not trip the sweep.
      .filter(c => "(^|[^_])zip_with\\(".r.findFirstIn(c.sparkSql).isDefined)
      .foreach { c =>
        val plan = spark.sql(c.sparkSql).queryExecution.optimizedPlan.toString
        assert(plan.contains("cosine_sim") || plan.contains("dot_f32"),
          s"${c.name}: HOF vector math not rewritten:\n${plan.take(1500)}")
      }
  }

  test("null/degenerate semantics survive the rewrite") {
    import spark.implicits._
    // RDD-backed (not a LocalRelation): ConvertToLocalRelation would
    // otherwise pre-evaluate the projection and hide the rewrite.
    val d = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      (1L, Array(1f, 2f), Array(1f, 2f)),          // normal
      (2L, Array(0f, 0f), Array(1f, 2f)),          // zero norm -> NaN
      (3L, Array(1f, 2f, 3f), Array(1f, 2f)),      // length mismatch -> null
      (4L, null.asInstanceOf[Array[Float]], Array(1f, 2f))), 2)) // null array -> null
      .toDF("id", "a", "b")
    val out = d.select(col("id"), VectorOps.cosine(col("a"), col("b")).as("s"))
      .orderBy("id").collect()
    assert(optimized(d.select(VectorOps.cosine(col("a"), col("b")))).contains("cosine_sim"))
    assert(math.abs(out(0).getDouble(1) - 1.0) < 1e-12)
    assert(out(1).getDouble(1).isNaN)
    assert(out(2).isNullAt(1) && out(3).isNullAt(1))
  }
}
