package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Catalyst optimizer rule: recognize the PORTABLE HOF vector lowerings —
  * the cross-engine dialect the declared corpus (and any user writing
  * engine-portable SQL) uses — and rewrite them to graft's native
  * expressions:
  *
  *   CASE WHEN sqrt(Σa²)*sqrt(Σb²) = 0 THEN NaN
  *        ELSE dot/(sqrt(Σa²)*sqrt(Σb²)) END              ⇒  cosine_sim(a,b)
  *   aggregate(zip_with(a,b,(x,y)->xd*yd), 0d, (acc,x)->acc+x)  ⇒  dot_f32(a,b)
  *   aggregate(transform(a,x->xd*xd), 0d, (acc,x)->acc+x)       ⇒  dot_f32(a,a)
  *
  * The rewrite is BIT-IDENTICAL, not merely equivalent: the native
  * expressions fold each accumulator left-to-right in double precision,
  * exactly the HOF accumulation order (FunctionsSpec pins it), and
  * null/length-mismatch cases agree (null-poisoned folds ⇒ NULL).
  *
  * The FUSED cosine fires only for the NaN-GUARDED CaseWhen shape
  * ([[graft.ops.VectorOps.cosine]]): there the guard's predicate-true arm
  * already yields NaN, which for float inputs is exactly cosine_sim's 0/0
  * (den = 0 ⇔ a norm's every float² summand is 0 ⇔ dot = 0 — a float²
  * cast to double cannot underflow to 0). A BARE `dot/(sqrt·sqrt)` divide
  * is NOT fused: Spark's Divide yields NULL (non-ANSI) or throws
  * (ANSI) on a 0.0 divisor, while cosine_sim yields NaN — fusing would
  * silently change user results for zero-norm/empty vectors. Instead the
  * three inner folds go native and the Divide node (with its evalMode) is
  * preserved — bit-identical in every case including degenerate ones,
  * still no intermediate arrays or per-element lambda dispatch (~20× per
  * pair on all-pairs scans, SURVEY.md §2.6). Users keep writing portable
  * SQL; Catalyst supplies the kernels.
  *
  * Guards: the product operands must carry EXPLICIT to-double casts over
  * the lambda variables (the portable dialect's `cast(x as double)`) — a
  * bare float-precision product `(x,y)->x*y` rounds each product to float
  * before the fold widens it, different bits than the double-product
  * kernel, so it is left untouched. The fused cosine additionally requires
  * the dot's operand arrays and the two norms' arrays to be semantically
  * the same `array<float>` pair, in the same order.
  */
object NativeVectorRewrite extends Rule[LogicalPlan] {

  /** The variable under an optional to-double cast (used for the fold's
    * accumulator step, where operands are already double). */
  private def asVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case v: NamedLambdaVariable => Some(v)
    case c: Cast if c.dataType == DoubleType => asVar(c.child)
    case _ => None
  }

  /** A lambda variable under an EXPLICIT to-double cast — the portable
    * dialect's product operand, `cast(x as double)`. A bare (uncast)
    * variable is rejected: over array<float> it means a float-precision
    * product, which the double-precision kernel would not reproduce
    * bit-for-bit. */
  private def castedVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case c: Cast if c.dataType == DoubleType =>
      c.child match {
        case v: NamedLambdaVariable => Some(v)
        case _ => None
      }
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
            case Multiply(l, r, _) => (castedVar(l), castedVar(r)) match {
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
          case Multiply(l, r, _) => (castedVar(l), castedVar(r)) match {
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

  private def isNaNLiteral(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) => java.lang.Double.isNaN(v)
    case _ => false
  }

  /** `den = 0.0` (either operand order) ⇒ the den expression. */
  private def denOfZeroCheck(p: Expression): Option[Expression] = p match {
    case EqualTo(den, z) if zeroDouble(z) => Some(den)
    case EqualTo(z, den) if zeroDouble(z) => Some(den)
    case _ => None
  }

  /** sqrt(Σa²) * sqrt(Σb²) ⇒ (a, b). */
  private def matchNormProduct(e: Expression): Option[(Expression, Expression)] =
    e match {
      case Multiply(Sqrt(na), Sqrt(nb), _) =>
        (matchSumSq(na), matchSumSq(nb)) match {
          case (Some(a), Some(b)) => Some((a, b))
          case _ => None
        }
      case _ => None
    }

  /** The NaN-guarded cosine ([[graft.ops.VectorOps.cosine]]'s shape):
    * `CASE WHEN den = 0 THEN NaN ELSE dot/den END` with den the norm
    * product of the dot's own operands. Predicate-true implies dot = 0
    * (see object doc), so the whole conditional is bit-identical to the
    * fused kernel's unconditional `dot/den` arithmetic. */
  private def matchGuardedCosine(e: Expression): Option[(Expression, Expression)] =
    e match {
      case CaseWhen(Seq((pred, nan)), Some(Divide(dot, den, _)))
          if isNaNLiteral(nan) &&
             denOfZeroCheck(pred).exists(_.semanticEquals(den)) =>
        (matchDot(dot), matchNormProduct(den)) match {
          case (Some((a, b)), Some((a2, b2)))
              if a.semanticEquals(a2) && b.semanticEquals(b2) &&
                 floatArray(a) && floatArray(b) =>
            Some((a, b))
          case _ => None
        }
      case _ => None
    }

  // Extractor objects: one evaluation per (node, pattern) — a
  // `case e if m(e).isDefined => m(e).get` shape would run each matcher
  // twice per hit, and the optimizer applies this rule to every
  // expression of every plan it sees.
  private object GuardedCosine {
    def unapply(e: Expression): Option[(Expression, Expression)] = matchGuardedCosine(e)
  }
  private object FloatDot {
    def unapply(e: Expression): Option[(Expression, Expression)] =
      matchDot(e).filter { case (a, b) => floatArray(a) && floatArray(b) }
  }
  private object FloatSumSq {
    def unapply(e: Expression): Option[Expression] = matchSumSq(e).filter(floatArray)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // Fused cosine only for the NaN-guarded conditional (top-down: the
    // CaseWhen is seen before its inner aggregates, so the dot case below
    // never pre-empts it). A BARE dot/(sqrt·sqrt) divide deliberately
    // falls through to the component rewrites: the Divide node survives
    // with its evalMode, keeping NULL/ANSI-error zero-divisor semantics.
    case GuardedCosine(a, b) => CosineSimilarity(a, b)
    case FloatDot(a, b)      => DotProduct(a, b)
    // Standalone sum-of-squares (the norm² fold): dot_f32(a, a) adds the
    // exact same xi·xi sequence left-to-right — bit-identical.
    case FloatSumSq(a)       => DotProduct(a, a)
  }
}
