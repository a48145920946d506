package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

import graft.ops.MinHashAgg

/** k-permutation MinHash signature of a token array in ONE pass per row.
  *
  * Value-identical to `DedupOps.minhashSignatures` (same seeded 48-bit md5
  * minima — MinHashAgg.hash48), but with no token explode and no
  * aggregation: on a corpus where every doc's tokens already sit in one
  * row, the per-doc signature is a projection, and the whole MinHash+LSH
  * dedup pipeline shuffles only at the band-bucket join.
  */
case class MinHashSig(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, literal int k), got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(tokens: Any, k: Any): Any =
    new GenericArrayData(
      MinHashSigUtil.sig(tokens.asInstanceOf[ArrayData], k.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.MinHashSigUtil.sig($t, $k))")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "minhash_sig"
}

object MinHashSigUtil {
  /** k seeded minima over the DISTINCT tokens of the array. One digest
    * instance and pre-encoded seed prefixes per call — not per (seed,
    * token) pair, which costs a provider lookup + allocations for
    * constant work on the hot path. */
  def sig(tokens: ArrayData, k: Int): Array[Long] = {
    val out = Array.fill(k)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefixes = Array.tabulate(k)(j => s"${j + 1}:".getBytes("UTF-8"))
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val w = tokens.getUTF8String(i).toString
        if (seen.add(w)) {
          val wb = w.getBytes("UTF-8")
          var j = 0
          while (j < k) {
            val h = MinHashAgg.hash48(md, prefixes(j), wb)
            if (h < out(j)) out(j) = h
            j += 1
          }
        }
      }
      i += 1
    }
    out
  }
}
