package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Catalyst optimizer rule: recognize the PORTABLE HOF vector lowerings —
  * the cross-engine dialect the declared corpus (and any user writing
  * engine-portable SQL) uses — and rewrite them to graft's fused native
  * expressions:
  *
  *   aggregate(zip_with(a,b,(x,y)->xd*yd), 0d, (acc,x)->acc+x)
  *     / (sqrt(aggregate(transform(a,x->xd*xd),…)) * sqrt(…b…))  ⇒  cosine_sim(a,b)
  *   aggregate(zip_with(a,b,(x,y)->xd*yd), 0d, (acc,x)->acc+x)   ⇒  dot_f32(a,b)
  *
  * The rewrite is BIT-IDENTICAL, not merely equivalent: the native
  * expressions fold each accumulator left-to-right in double precision,
  * exactly the HOF accumulation order (FunctionsSpec pins it), and
  * null/length-mismatch/zero-norm cases agree (null-poisoned folds ⇒ NULL,
  * 0/0 ⇒ NaN). What changes is the execution shape: one codegen'd loop
  * with scalar accumulators instead of three HOF passes materializing
  * intermediate arrays — measured ~20× per pair on all-pairs scans
  * (SURVEY.md §2.6). Users keep writing portable SQL; Catalyst supplies
  * the kernel.
  *
  * Guards: only fires when the dot's operand arrays and the two norms'
  * arrays are semantically the same `array<float>` pair, in the same
  * order. Anything else (double arrays, mismatched norm operands, custom
  * folds) is left untouched.
  */
object NativeVectorRewrite extends Rule[LogicalPlan] {

  /** The variable under an optional to-double cast (the portable dialect
    * writes cast(x as double); analysis may also insert it). */
  private def asVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case v: NamedLambdaVariable => Some(v)
    case c: Cast if c.dataType == DoubleType => asVar(c.child)
    case _ => None
  }

  private def isIdentity(f: LambdaFunction): Boolean = f.function match {
    case v: NamedLambdaVariable => f.arguments.headOption.exists(_.exprId == v.exprId)
    case _ => false
  }

  /** (acc, x) -> acc + x, either operand order (FP add of the same two
    * operands is the same bits). */
  private def isAccPlusElem(f: LambdaFunction): Boolean = f.arguments match {
    case Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable) =>
      f.function match {
        case Add(l, r, _) => (asVar(l), asVar(r)) match {
          case (Some(a), Some(b)) =>
            Set(a.exprId, b.exprId) == Set(acc.exprId, x.exprId)
          case _ => false
        }
        case _ => false
      }
    case _ => false
  }

  private def zeroDouble(e: Expression): Boolean =
    e.foldable && e.dataType == DoubleType && e.eval() == 0.0

  /** aggregate(zip_with(a, b, (x,y)->xd*yd), 0d, (acc,x)->acc+x) ⇒ (a, b) */
  private def matchDot(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(
        ZipWith(a, b, prod: LambdaFunction), zero,
        merge: LambdaFunction, finish: LambdaFunction)
        if zeroDouble(zero) && isAccPlusElem(merge) && isIdentity(finish) =>
      prod.arguments match {
        case Seq(x: NamedLambdaVariable, y: NamedLambdaVariable) =>
          prod.function match {
            case Multiply(l, r, _) => (asVar(l), asVar(r)) match {
              case (Some(v1), Some(v2))
                  if Set(v1.exprId, v2.exprId) == Set(x.exprId, y.exprId) =>
                Some((a, b))
              case _ => None
            }
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  /** aggregate(transform(a, x->xd*xd), 0d, (acc,x)->acc+x) ⇒ a */
  private def matchSumSq(e: Expression): Option[Expression] = e match {
    case ArrayAggregate(
        ArrayTransform(a, sq: LambdaFunction), zero,
        merge: LambdaFunction, finish: LambdaFunction)
        if zeroDouble(zero) && isAccPlusElem(merge) && isIdentity(finish) =>
      sq.arguments match {
        case Seq(x: NamedLambdaVariable) => sq.function match {
          case Multiply(l, r, _) => (asVar(l), asVar(r)) match {
            case (Some(v1), Some(v2))
                if v1.exprId == x.exprId && v2.exprId == x.exprId => Some(a)
            case _ => None
          }
          case _ => None
        }
        case _ => None
      }
    case _ => None
  }

  private def floatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // Full cosine shape first (top-down: the Divide is seen before its
    // inner aggregates, so the dot below never pre-empts it).
    case d @ Divide(dot, Multiply(Sqrt(na), Sqrt(nb), _), _) =>
      (matchDot(dot), matchSumSq(na), matchSumSq(nb)) match {
        case (Some((a, b)), Some(a2), Some(b2))
            if a.semanticEquals(a2) && b.semanticEquals(b2) &&
               floatArray(a) && floatArray(b) =>
          CosineSimilarity(a, b)
        case _ => d
      }
    case e if matchDot(e).exists { case (a, b) => floatArray(a) && floatArray(b) } =>
      val (a, b) = matchDot(e).get
      DotProduct(a, b)
    // Standalone sum-of-squares (the norm² fold): dot_f32(a, a) adds the
    // exact same xi·xi sequence left-to-right — bit-identical.
    case e if matchSumSq(e).exists(floatArray) =>
      val a = matchSumSq(e).get
      DotProduct(a, a)
  }
}
