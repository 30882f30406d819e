package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for FLOAT[] vector math. These stay
  * inside whole-stage codegen (the generated code is a direct static
  * call into [[VecKernels]]'s primitive loops), unlike the
  * `zip_with`/`aggregate` higher-order formulation which falls out of
  * codegen and boxes every element — ~10x on brute-force similarity
  * scans (SURVEY §4.2: "upgrade to a codegen'd Catalyst Expression
  * only if bench demands" — bench demanded).
  */
abstract class FloatVecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def kernel: String // method name on VecKernels

  override def nullSafeEval(a: Any, b: Any): Any = kernel match {
    case "dot"    => VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "dotF32" => VecKernels.dotF32(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "cosine" => VecKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case "l2"     => VecKernels.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.$kernel($a, $b)")
}

case class FloatDot(left: Expression, right: Expression) extends FloatVecBinary {
  override protected def kernel: String = "dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** [[VecFusion]]'s rewrite target: float-rounded products, double
  * accumulation — bit-identical to the `aggregate(zip_with(...))` SQL
  * idiom it replaces (see [[VecKernels.dotF32]]).
  */
case class FloatDotF32(left: Expression, right: Expression) extends FloatVecBinary {
  override protected def kernel: String = "dotF32"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class FloatCosine(left: Expression, right: Expression) extends FloatVecBinary {
  override protected def kernel: String = "cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class FloatL2(left: Expression, right: Expression) extends FloatVecBinary {
  override protected def kernel: String = "l2"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class FloatNormSq(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    VecKernels.normSq(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.normSq($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.sortedIntersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.sortedIntersect($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class LongArrayAgreeFrac(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.agreeFrac(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.agreeFrac($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any): Any =
    VecKernels.simHash64(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.simHash64($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** JL sign projection FLOAT[] → BIGINT[outDim] as a single codegen
  * kernel call — see [[VecKernels.jlProject]] for the exact-arithmetic
  * contract (replaces the interpreted nested-HOF formulation that
  * evaluated outDim·dim lambdas per row).
  */
case class JlProjectVec(child: Expression, outDim: Int, scale: Long)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    VecKernels.jlProject(a.asInstanceOf[ArrayData], outDim, scale)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VecKernels.jlProject($a, $outDim, ${scale}L)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 1-bit sign pack FLOAT[] → BIGINT (bit i = v[i] >= 0) — see
  * [[VecKernels.signPack]]. Pairs with `bit_count(a ^ b)` for the
  * Hamming candidate stage of binary-quantized ANN.
  */
case class SignPack64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any): Any =
    VecKernels.signPack(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.signPack($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Late-interaction MaxSim FLOAT[]×FLOAT[] → BIGINT as a single
  * codegen kernel call — see [[VecKernels.maxSim]] for the exact
  * integer-quantized arithmetic contract.
  */
case class MaxSimQuant(left: Expression, right: Expression,
    m: Int, dsub: Int, scale: Long) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.maxSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      m, dsub, scale)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.maxSim($a, $b, $m, $dsub, ${scale}L)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** [[MaxSimQuant]]'s quantization stage as its own expression:
  * FLOAT[] → BIGINT[n] (see [[VecKernels.quantizeVec]]) — applied once
  * per stored vector so pair scoring ([[MaxSimPre]]) is pure long math.
  */
case class QuantizeVec(child: Expression, n: Int, scale: Long)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    VecKernels.quantizeVec(a.asInstanceOf[ArrayData], n, scale)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VecKernels.quantizeVec($a, $n, ${scale}L)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** MaxSim over two pre-quantized BIGINT[] vectors — see
  * [[VecKernels.maxSimPre]].
  */
case class MaxSimPre(left: Expression, right: Expression, m: Int, dsub: Int)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.maxSimPre(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      m, dsub)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.maxSimPre($a, $b, $m, $dsub)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class FloatHyperplaneBucket(child: Expression, nPlanes: Int, seed: Int)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any): Any =
    VecKernels.hyperplane(a.asInstanceOf[ArrayData], nPlanes, seed)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VecKernels.hyperplane($a, $nPlanes, $seed)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
