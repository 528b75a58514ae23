package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types
import org.apache.spark.sql.types.{ArrayType, DoubleType, NumericType}

/** Optimizer rule: recognize the interpreted higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(x, y, (p, q) -> double(p) * double(q)), 0.0d, (acc, v) -> acc + v) }}}
  *
  * and rewrite it to the fused [[DotProductExpr]]. The HOF form is what
  * users naturally write (and what this library itself wrote before the
  * native expression existed); it materializes the zipped product array
  * and folds it with `CodegenFallback` lambdas. The rewrite is safe
  * because [[DotProductExpr]] reproduces the fold exactly: IEEE double
  * products/sums in element order, null on any null element or length
  * mismatch (`zip_with` pads with null and the fold absorbs it into a
  * null accumulator).
  *
  * Guards: both inputs must be numeric arrays, the zero literal exactly
  * `0.0d`, the merge a bare `acc + v` over the lambda variables, the
  * finish the identity. Multiplication/addition operand order is
  * irrelevant (IEEE `*` and `+` are commutative in value and bit
  * pattern). Registered via
  * [[GraftExtensions]] (`injectOptimizerRule`). */
class FuseDotRule extends Rule[LogicalPlan] {

  /** The lambda body must be (a cast to double of) exactly `v`. */
  private def isDoubleOf(e: Expression, v: NamedExpression): Boolean = e match {
    case c: Cast =>
      c.dataType == DoubleType && isVar(c.child, v)
    case other => isVar(other, v) && other.dataType == DoubleType
  }

  private def isVar(e: Expression, v: NamedExpression): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** Primitive numeric arrays only: DotProductExpr reads elements with
    * primitive getters, so a decimal-array fold (valid as a HOF) must
    * NOT be rewritten. */
  private def numericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(_: types.DecimalType, _) => false
    case ArrayType(_: NumericType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(x, y, LambdaFunction(Multiply(ml, mr, _), Seq(p, q), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(al, ar, _), Seq(acc, v), _),
          LambdaFunction(finBody, Seq(f), _))
        if numericArray(x) && numericArray(y) &&
          ((isDoubleOf(ml, p) && isDoubleOf(mr, q)) ||
            (isDoubleOf(ml, q) && isDoubleOf(mr, p))) &&
          ((isVar(al, acc) && isVar(ar, v)) || (isVar(al, v) && isVar(ar, acc))) &&
          isVar(finBody, f) =>
        DotProductExpr(x, y)
    }
}
