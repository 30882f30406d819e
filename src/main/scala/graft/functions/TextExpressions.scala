package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-normalization kernels for the codegen expression below.
  * `isNormalized` is a cheap scan that returns true for the ASCII/
  * already-composed common case, so the hot path allocates nothing —
  * the Java String round-trip is paid only by rows that actually
  * carry decomposed sequences.
  */
object TextKernels {
  private def norm(s: UTF8String, f: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
  def nfc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFC)
  def nfd(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFD)
  def nfkc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFKC)
  def nfkd(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFKD)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen
  * expression — the canonicalization every text pipeline runs before
  * hashing/dedup (a composed "é" and its decomposed twin must collapse
  * to one byte sequence or every downstream exact-dup/fingerprint/
  * group-by key silently splits). Spark has no built-in for this; a
  * Scala UDF would pay the serialization boundary per row, so this is
  * the (b)-tier custom Expression from the build plan: one static call
  * inside whole-stage codegen.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unsupported normalization form: $form")
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any): Any = form match {
    case "NFC"  => TextKernels.nfc(a.asInstanceOf[UTF8String])
    case "NFD"  => TextKernels.nfd(a.asInstanceOf[UTF8String])
    case "NFKC" => TextKernels.nfkc(a.asInstanceOf[UTF8String])
    case "NFKD" => TextKernels.nfkd(a.asInstanceOf[UTF8String])
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.${form.toLowerCase}($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Column API over [[UnicodeNormalize]] plus the accent-folding
  * composition (NFD → drop combining marks → NFC) used for
  * diacritic-insensitive dedup keys.
  */
object TextFunctions {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def unicodeNormalize(c: Column, form: String): Column =
    column(UnicodeNormalize(expression(c), form))

  /** Diacritic fold: decompose, strip the combining-mark block
    * U+0300–U+036F, recompose. "café" and "café" both → "cafe".
    */
  def foldAccents(c: Column): Column =
    unicodeNormalize(org.apache.spark.sql.functions.regexp_replace(
      unicodeNormalize(c, "NFD"), "[\\x{0300}-\\x{036F}]", ""), "NFC")
}
