package graft.plans

import graft.functions.DotProductF
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product over float vectors,
  *
  *   aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)),
  *             cast(0.0 as double), (acc, v) -> acc + v)
  *
  * into the codegen'd [[DotProductF]]. Same fold order (sequential from
  * index 0, 0.0 seed) so the rewrite is bit-exact — it only removes the
  * per-element lambda dispatch and the intermediate zipped array, the
  * cost that dominates brute-force similarity scans. SQL users get the
  * fast path without knowing the custom expression exists.
  *
  * Registered via [[graft.GraftExtensions]] (session build) or
  * `spark.experimental.extraOptimizations` (live session).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression) = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isZeroDouble(e: Expression) =
    e.foldable && e.dataType == DoubleType && {
      val v = e.eval()
      v != null && v.asInstanceOf[Double] == 0.0
    }

  /** (double)x * (double)y over the zip lambda's two variables, either
    * operand order (multiplication is commutative bit-for-bit). */
  private def isXtimesY(e: Expression, x: NamedLambdaVariable, y: NamedLambdaVariable) =
    e match {
      case Multiply(Cast(l: NamedLambdaVariable, DoubleType, _, _),
                    Cast(r: NamedLambdaVariable, DoubleType, _, _), _) =>
        (l.exprId == x.exprId && r.exprId == y.exprId) ||
          (l.exprId == y.exprId && r.exprId == x.exprId)
      case _ => false
    }

  private def isAccPlusV(e: Expression, acc: NamedLambdaVariable, v: NamedLambdaVariable) =
    e match {
      case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
        (l.exprId == acc.exprId && r.exprId == v.exprId) ||
          (l.exprId == v.exprId && r.exprId == acc.exprId)
      case _ => false
    }

  private def isIdentity(finish: Expression) = finish match {
    case LambdaFunction(out: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      out.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mult, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            finish)
          if isFloatArray(a) && isFloatArray(b) && isZeroDouble(zero) &&
            isXtimesY(mult, x, y) && isAccPlusV(add, acc, v) && isIdentity(finish) =>
        DotProductF(a, b)
    }
}
