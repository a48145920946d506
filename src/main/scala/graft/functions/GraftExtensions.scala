package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's Catalyst extension seam (SURVEY.md §4.3): native functions
  * registered into the session's FunctionRegistry so they are callable from
  * SQL (`cosine_sim(a, b)`) and the Column API
  * (`call_function("cosine_sim", a, b)`).
  *
  * Wired by `graft.engine.Graft.session` via `builder.withExtensions`; an
  * external session can opt in with
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}

object GraftFunctions {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "", "", "", "", "", "", "built-in")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      info(classOf[CosineSimilarity], "cosine_sim",
        "cosine_sim(a, b) - single-pass cosine similarity of two float arrays in double precision"),
      (e: Seq[Expression]) => CosineSimilarity(e.head, e(1))),
    (FunctionIdentifier("dot_f32"),
      info(classOf[DotProduct], "dot_f32",
        "dot_f32(a, b) - dot product of two float arrays in double precision"),
      (e: Seq[Expression]) => DotProduct(e.head, e(1))),
    (FunctionIdentifier("simhash16"),
      info(classOf[SimHash16], "simhash16",
        "simhash16(tokens) - 16-bit SimHash of a token array, one pass per row"),
      (e: Seq[Expression]) => SimHash16(e.head)),
    (FunctionIdentifier("minhash_sig"),
      info(classOf[MinHashSig], "minhash_sig",
        "minhash_sig(tokens, k) - k-permutation MinHash signature, one pass per row"),
      (e: Seq[Expression]) => MinHashSig(e.head, e(1))),
    (FunctionIdentifier("bloom_might_contain"),
      info(classOf[BloomMightContain], "bloom_might_contain",
        "bloom_might_contain(sketch, key) - membership probe against a serialized Bloom filter (no false negatives)"),
      (e: Seq[Expression]) => BloomMightContain(e.head, e(1))),
    (FunctionIdentifier("cms_estimate"),
      info(classOf[CmsEstimateCount], "cms_estimate",
        "cms_estimate(sketch, key) - count-min frequency upper bound for a key"),
      (e: Seq[Expression]) => CmsEstimateCount(e.head, e(1))),
  )

  def inject(ext: SparkSessionExtensions): Unit = all.foreach(ext.injectFunction)

  /** Fallback for sessions NOT built through graft.engine.Graft (no
    * extension hook ran): register the native functions directly into the
    * session's FunctionRegistry. The registry is session-internal, so this
    * goes through reflection; a non-fatal failure downgrades the session to
    * the HOF lowerings with a WARNING naming the missing functions (so a
    * later 'undefined function cosine_sim' has a visible cause), and fatal
    * VM errors propagate. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    try {
      if (!spark.catalog.functionExists("cosine_sim")) {
        val ss = spark.getClass.getMethod("sessionState").invoke(spark)
        val fr = ss.getClass.getMethod("functionRegistry").invoke(ss)
        val m = fr.getClass.getMethods.find { mm =>
          mm.getName == "registerFunction" && mm.getParameterCount == 3 &&
            mm.getParameterTypes()(0) == classOf[FunctionIdentifier]
        }
        m.foreach { mm =>
          all.foreach { case (id, inf, builder) =>
            mm.invoke(fr, id, inf, builder)
          }
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"WARN graft: native function registration failed (${e.getClass.getSimpleName}: " +
            s"${e.getMessage}) — ${all.map(_._1.funcName).mkString(", ")} " +
            "are unavailable on this session; queries using them will fail to resolve")
    }
}
