package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 16-bit SimHash of a token array in ONE pass per row.
  *
  * Bit-compatible with the declared q56 lowering (md5 hex digits, ±1 votes
  * per distinct token per bit), but a pure projection: the SQL/relational
  * form costs an explode to (doc, token) plus a cross join with 16 bit
  * indexes and TWO hash aggregations — two shuffles whose width is tokens ×
  * bits. At 100 TB, turning that into a per-row expression removes the
  * shuffles entirely; fingerprinting becomes scan-speed.
  *
  * Codegen emits a call to [[SimHashUtil.simhash16]] (one static call per
  * row), so the expression stays inside whole-stage codegen.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    SimHashUtil.simhash16(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash16($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)

  override def prettyName: String = "simhash16"
}

object SimHashUtil {

  /** Same bit math as the q56 SQL: for distinct token w, hex digit
    * `h = md5(w)[j/4]` contributes bit `floor(h / 2^(j%4)) % 2` as a ±1
    * vote on bit j; the result sets bit j when votes are positive. */
  def simhash16(tokens: ArrayData): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](16)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val w = tokens.getUTF8String(i).toString
        if (seen.add(w)) {
          md.reset()
          val d = md.digest(w.getBytes("UTF-8"))
          var j = 0
          while (j < 16) {
            val hexIdx = j / 4
            val b = d(hexIdx / 2)
            val digit = if (hexIdx % 2 == 0) (b >>> 4) & 0xf else b & 0xf
            val bit = (digit >>> (j % 4)) & 1
            votes(j) += (if (bit == 1) 1 else -1)
            j += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
