package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.FloatDot

/** Optimizer rule: fuse the idiomatic SQL dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, x) -> s + x) }}}
  *
  * into the native codegen'd [[FloatDot]] kernel. The higher-order
  * formulation is the one a SQL-only user writes — and it falls out of
  * whole-stage codegen, boxes every element, and allocates an
  * intermediate array per row (~10x on brute-force similarity scans,
  * SURVEY §4.2). The rewrite gives that user the same fused primitive
  * loop the Column API's `vec_dot` gets, without changing a line of
  * their query.
  *
  * Soundness guards (all must hold or the expression is left alone):
  *  - both arrays are `array<float>` with non-null elements, and are
  *    plain attribute references (no double evaluation of computed
  *    children in the length guard);
  *  - the zip lambda is exactly `x * y` and the fold lambda exactly
  *    `s + x` (commuted operands accepted; inserted numeric upcasts
  *    stripped), with the finish lambda the identity;
  *  - the fold seed is a foldable zero.
  *
  * Unequal-length semantics are preserved: `zip_with` null-pads the
  * shorter array, which null-poisons the sum — so the fused form is
  * wrapped in `if (size(a) = size(b), dot, null)`.
  */
object VecFusion extends Rule[LogicalPlan] {

  private def isFloatArrayAttr(e: Expression): Boolean = e match {
    case _: Attribute => e.dataType match {
      case ArrayType(FloatType, false) => true
      case _ => false
    }
    case _ => false
  }

  private def strip(e: Expression): Expression = e match {
    case c: Cast => strip(c.child)
    case _ => e
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    strip(e) match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _ => false
    }

  private def isZero(e: Expression): Boolean =
    e.foldable && (e.eval() match {
      case d: java.lang.Double  => d == 0.0
      case f: java.lang.Float   => f == 0.0f
      case i: java.lang.Integer => i == 0
      case l: java.lang.Long    => l == 0L
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(la, ra, LambdaFunction(mul: Multiply,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(add: Add,
              Seq(s: NamedLambdaVariable, e: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(f: NamedLambdaVariable), _))
          if isFloatArrayAttr(la) && isFloatArrayAttr(ra) && isZero(zero) &&
            ((isVar(mul.left, x) && isVar(mul.right, y)) ||
              (isVar(mul.left, y) && isVar(mul.right, x))) &&
            ((isVar(add.left, s) && isVar(add.right, e)) ||
              (isVar(add.left, e) && isVar(add.right, s))) &&
            isVar(fin, f) =>
        If(EqualTo(Size(la), Size(ra)),
          FloatDot(la, ra), Literal(null, DoubleType))
    }
}
