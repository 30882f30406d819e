package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.FloatDotF32

/** Optimizer rule: fuse the idiomatic SQL dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, x) -> s + x) }}}
  *
  * into the native codegen'd [[FloatDotF32]] kernel. The higher-order
  * formulation is the one a SQL-only user writes — and it falls out of
  * whole-stage codegen, boxes every element, and allocates an
  * intermediate array per row (~10x on brute-force similarity scans,
  * SURVEY §4.2). The rewrite gives that user a fused primitive loop
  * without changing a line of their query — and without changing a BIT
  * of their result: the kernel reproduces the idiom's float-rounded
  * products exactly (double products would be ~1 ulp more accurate,
  * i.e. observably different — see [[graft.functions.VecKernels.dotF32]]).
  *
  * Soundness guards (all must hold or the expression is left alone):
  *  - the aggregate's own type is DOUBLE (a float seed makes the whole
  *    fold FLOAT-typed — rewriting that to a double kernel would
  *    corrupt the column);
  *  - both arrays are `array<float>` with non-null elements, and are
  *    plain attribute references (no double evaluation of computed
  *    children in the length guard);
  *  - the zip lambda is exactly `x * y` and the fold lambda exactly
  *    `s + x` (commuted operands accepted; inserted numeric upcasts
  *    stripped), with the finish lambda the identity;
  *  - the fold seed is a foldable DOUBLE zero.
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

  // Exact lambda-variable reference, NO cast stripping: used for the
  // zip lambda, where `CAST(x AS DOUBLE) * CAST(y AS DOUBLE)` is a
  // genuinely different (double-product) computation the float kernel
  // must not replace — each product differs by up to 1 ulp.
  private def isVarStrict(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _ => false
    }

  // Cast-stripping variant for the FOLD lambda only: with a float
  // element and a double accumulator, analysis inserts `s +
  // CAST(e AS DOUBLE)` — that upcast is exactly what the kernel's
  // double accumulation reproduces, so it is safe to see through.
  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    strip(e) match {
      case n: NamedLambdaVariable => n.exprId == v.exprId
      case _ => false
    }

  // Positive DOUBLE zero only: a float/int seed types the whole fold
  // differently (and the whole match is additionally gated on the
  // aggregate's own dataType being DoubleType); -0.0 is rejected by
  // raw-bits comparison because the kernel's accumulator starts at
  // +0.0, and an empty array would observably return the seed.
  private def isZero(e: Expression): Boolean =
    e.dataType == DoubleType && e.foldable && (e.eval() match {
      case d: java.lang.Double =>
        java.lang.Double.doubleToRawLongBits(d) == 0L
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(la, ra, LambdaFunction(mul: Multiply,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(add: Add,
              Seq(s: NamedLambdaVariable, e: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(f: NamedLambdaVariable), _))
          if agg.dataType == DoubleType &&
            isFloatArrayAttr(la) && isFloatArrayAttr(ra) && isZero(zero) &&
            // FLOAT-typed multiply of the bare lambda variables: an
            // explicit double-product idiom (casts inside the zip
            // lambda) computes different values and must not fuse
            mul.dataType == FloatType &&
            ((isVarStrict(mul.left, x) && isVarStrict(mul.right, y)) ||
              (isVarStrict(mul.left, y) && isVarStrict(mul.right, x))) &&
            ((isVar(add.left, s) && isVar(add.right, e)) ||
              (isVar(add.left, e) && isVar(add.right, s))) &&
            isVar(fin, f) =>
        If(EqualTo(Size(la), Size(ra)),
          FloatDotF32(la, ra), Literal(null, DoubleType))
    }
}
