package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0d, (acc, v) -> acc + v)
  *
  * over two `array<float>` columns into the codegen'd [[DotProductF]]
  * kernel. The two forms are bit-identical by construction — same
  * left-to-right accumulation from 0.0 with per-term double widening, and
  * identical NULL behavior (zip_with pads a length mismatch with nulls,
  * the null product nulls the fold; DotProductF returns NULL on mismatch
  * or null element) — DotProductSpec pins the equivalence. The win is
  * mechanical: HOFs evaluate interpreted with per-element lambda binding
  * and an intermediate products array, while the kernel is a tight
  * whole-stage-codegen loop. Users writing the natural declarative form
  * get kernel performance without knowing `dot_f` exists.
  *
  * Injected by [[graft.GraftExtensions]] via `injectOptimizerRule`, so it
  * runs inside the operator-optimization batch (after constant folding has
  * reduced the zero literal).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(x: NamedLambdaVariable, DoubleType, _, _) => x.exprId == v.exprId
    case x: NamedLambdaVariable => x.exprId == v.exprId && x.dataType == DoubleType
    case _ => false
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(l, r,
          LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(Add(aL: NamedLambdaVariable, aR: NamedLambdaVariable, _),
          Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(facc: NamedLambdaVariable), _))
      if isFloatArray(l) && isFloatArray(r) &&
        ((isDoubleOf(mx, x) && isDoubleOf(my, y)) || (isDoubleOf(mx, y) && isDoubleOf(my, x))) &&
        aL.exprId == acc.exprId && aR.exprId == v.exprId &&
        fin.exprId == facc.exprId &&
        zero.foldable && zero.dataType == DoubleType &&
        zero.eval() == 0.0 =>
      DotProductF(l, r)
  }
}
