package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

/** Hashed-n-gram linear-model scoring kernel (fastText's trick, which
  * is how production pipelines run language-ID/quality classifiers
  * over web-scale corpora: features are character n-grams hashed into
  * a fixed bucket table, the model is one weight per bucket, and
  * inference is a single narrow pass — embarrassingly parallel, no
  * shuffle, no vocabulary broadcast). The weight table here is
  * derived from the bucket hash itself (`(hash60(gram) mod m) -
  * (m-1)/2`, m odd) so the whole computation is a pure function of
  * the text and exactly replayable in DuckDB SQL for the oracle —
  * a real model would broadcast a weight array instead; the data
  * path (per-row gram loop, md5 bucket hash, integer accumulate) is
  * identical. hash60 = first 15 hex digits of md5 of the gram's
  * UTF-8 bytes, the same hash the KMV/manifest stack uses.
  */
object ClassifierKernels {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) read as the 15-hex-digit prefix —
    * equals `CAST('0x' || substring(md5(s),1,15) AS BIGINT)`.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Σ over code-point n-grams of weights[hash60(gram) mod len] —
    * the externally-trained-model form: the weight table is a plain
    * `long[]` that rides the serialized expression to every executor
    * (for big models this is where a broadcast variable or a
    * memory-mapped side file would slot in; the data path is
    * identical).
    */
  def ngramScoreW(s: UTF8String, n: Int, weights: Array[Long]): Long = {
    val str = s.toString
    val cpCount = str.codePointCount(0, str.length)
    if (cpCount < n) return 0L
    var score = 0L
    var start = 0
    var i = 0
    while (i <= cpCount - n) {
      val end = str.offsetByCodePoints(start, n)
      val h = hash60(str.substring(start, end)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      score += weights((h % weights.length).toInt)
      start = str.offsetByCodePoints(start, 1)
      i += 1
    }
    score
  }

  /** Σ over code-point n-grams of ((hash60(gram) mod m) - (m-1)/2).
    * Code-point positions match DuckDB/Spark SUBSTRING semantics;
    * empty/short text scores 0.
    */
  def ngramScore(s: UTF8String, n: Int, m: Int): Long = {
    val str = s.toString
    val cpCount = str.codePointCount(0, str.length)
    if (cpCount < n) return 0L
    val half = (m - 1) / 2
    var score = 0L
    var start = 0 // UTF-16 offset of gram start
    var i = 0
    while (i <= cpCount - n) {
      val end = str.offsetByCodePoints(start, n)
      val gram = str.substring(start, end)
      score += hash60(
        gram.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % m - half
      start = str.offsetByCodePoints(start, 1)
      i += 1
    }
    score
  }
}

/** Content-defined chunking kernels — the storage-dedup technique
  * (FastCDC/LBFS lineage) for corpora where near-identical documents
  * share long runs: cut wherever a rolling window's hash hits a
  * residue class, so chunk boundaries realign after ANY insertion or
  * deletion (fixed-size blocks would shift every boundary after an
  * edit and kill the dedup). Boundary rule here: a cut falls after
  * code-point `i + w - 1` whenever `hash60(gram(i, w)) % m == 0`
  * (cuts after the final character are no-ops) — a pure function of
  * the text, exactly replayable in DuckDB for the oracle.
  */
object ChunkKernels {
  /** Split into content-defined chunks; concatenation of the result
    * is always the input. Empty input → zero chunks.
    */
  def cdcChunks(s: UTF8String, w: Int, m: Int): ArrayData = {
    val str = s.toString
    val cpCount = str.codePointCount(0, str.length)
    if (cpCount == 0) return new GenericArrayData(Array.empty[Any])
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int] // UTF-16 off
    if (cpCount >= w) {
      var start = 0 // UTF-16 offset of window start
      var i = 0
      while (i <= cpCount - w) {
        val end = str.offsetByCodePoints(start, w)
        val gram = str.substring(start, end)
        val h = ClassifierKernels.hash60(
          gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (h % m == 0 && end < str.length) cuts += end
        start = str.offsetByCodePoints(start, 1)
        i += 1
      }
    }
    val bounds = (0 +: cuts.distinct.sorted) :+ str.length
    val out = new Array[Any](bounds.length - 1)
    var j = 0
    while (j < out.length) {
      out(j) = UTF8String.fromString(str.substring(bounds(j), bounds(j + 1)))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `cdc_chunks(text, w, m)` — [[ChunkKernels.cdcChunks]] as one
  * codegen expression (same rationale as [[HashedNgramScore]]: the
  * per-window md5 loop must not fall out of whole-stage codegen).
  */
case class CdcChunks(child: Expression, w: Int, m: Int)
    extends UnaryExpression {
  require(w >= 2 && m >= 2, s"need w>=2 and m>=2, got w=$w m=$m")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    ChunkKernels.cdcChunks(a.asInstanceOf[UTF8String], w, m)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ChunkKernels.cdcChunks($c, $w, $m)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `hashed_ngram_score(text, n, m)` — the [[ClassifierKernels]] loop
  * as one codegen expression: whole-stage codegen calls the static
  * kernel once per row (the q167 lesson — Spark's HOF `aggregate` is
  * CodegenFallback, so a `transform`/`aggregate` formulation of the
  * same loop would run interpreted with per-gram Column overhead).
  */
case class HashedNgramScore(child: Expression, n: Int, m: Int)
    extends UnaryExpression {
  require(n >= 1 && m >= 3 && m % 2 == 1,
    s"need n>=1 and odd m>=3, got n=$n m=$m")
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    ClassifierKernels.ngramScore(a.asInstanceOf[UTF8String], n, m)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ClassifierKernels.ngramScore($c, $n, $m)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `hashed_ngram_score_w(text)` with an explicit weight table — the
  * production classifier shape ([[ClassifierKernels.ngramScoreW]]):
  * weights trained elsewhere, loaded as a bounded table, folded into
  * the plan as a reference object, scored in one codegen pass.
  */
case class HashedNgramScoreWeighted(child: Expression, n: Int,
    weights: Array[Long]) extends UnaryExpression {
  require(n >= 1 && weights.nonEmpty, "need n>=1 and a non-empty table")
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    ClassifierKernels.ngramScoreW(a.asInstanceOf[UTF8String], n, weights)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("ngramWeights", weights, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ClassifierKernels.ngramScoreW($c, $n, $w)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
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

  /** Hashed-char-n-gram linear score (see [[HashedNgramScore]]). */
  def hashedNgramScore(c: Column, n: Int, m: Int): Column =
    column(HashedNgramScore(expression(c), n, m))

  /** Content-defined chunks (see [[CdcChunks]]). */
  def cdcChunks(c: Column, w: Int, m: Int): Column =
    column(CdcChunks(expression(c), w, m))

  /** Weighted classifier score (see [[HashedNgramScoreWeighted]]). */
  def hashedNgramScoreW(c: Column, n: Int, weights: Array[Long]): Column =
    column(HashedNgramScoreWeighted(expression(c), n, weights))
}
