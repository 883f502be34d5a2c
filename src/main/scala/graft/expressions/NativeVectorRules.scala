package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the documented interpreted dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)),
  *             0.0d, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[DotProduct]]. Higher-order array functions
  * evaluate interpreted (lambda dispatch per element, outside whole-stage
  * codegen); users writing the natural SQL/Column fold get the fused
  * primitive loop automatically. [[DotProduct]] reproduces the fold's exact
  * semantics — null element or length mismatch (zip_with pads with null)
  * yields null — so the rewrite is observation-equivalent, which the spec
  * asserts on nulls, mismatched lengths and values.
  *
  * Registered cluster-wide via `spark.sql.extensions=graft.expressions.
  * GraftExtensions` (injectOptimizerRule) or per-session via
  * `GraftExtensions.register(spark)` (experimental.extraOptimizations).
  */
object NativeVectorRules extends Rule[LogicalPlan] {

  private def stripCastToDouble(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case other => other
  }

  private def isElemMul(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)
        if m.dataType == DoubleType =>
      val l = stripCastToDouble(m.left)
      val r = stripCastToDouble(m.right)
      (l.semanticEquals(x) && r.semanticEquals(y)) ||
        (l.semanticEquals(y) && r.semanticEquals(x))
    case _ => false
  }

  private def isSum(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(a: Add, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (a.left.semanticEquals(x) && a.right.semanticEquals(y)) ||
        (a.left.semanticEquals(y) && a.right.semanticEquals(x))
    case _ => false
  }

  private def isIdentity(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(b: NamedLambdaVariable, Seq(x: NamedLambdaVariable), _) =>
      b.semanticEquals(x)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(zw: ZipWith, Literal(0.0, DoubleType),
        merge: LambdaFunction, finish: LambdaFunction)
        if (zw.function match {
          case lf: LambdaFunction => isElemMul(lf)
          case _ => false
        }) && isSum(merge) && isIdentity(finish) =>
      DotProduct(zw.left, zw.right)
  }
}
