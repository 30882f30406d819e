package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing kernel (Schleimer/Wilkerson/Aiken, SIGMOD 2003)
  * — the O(L) replacement for the sliding-window-min DataFrame plan in
  * [[graft.operators.Winnow.fingerprints]].
  *
  * The previous plan exploded every k-gram hash (one row per position)
  * through an Exchange(did) + sort, then evaluated
  * `min(struct(h, -pos))` over a ROWS frame of w rows — Spark's
  * SlidingWindowFunctionFrame recomputes the aggregate buffer from
  * scratch per row, so the window pass is O(L·w) struct comparisons
  * per document ON TOP of shuffling L rows per doc. This kernel
  * computes the identical selection set with a monotonic deque in one
  * O(L) scan per document inside whole-stage codegen: no gram rows
  * ever leave the scan stage, no exchange, no sort.
  *
  * Exactness contract (what the golden pins require):
  *  - gram hash = `xxhash64(substr(text, p, k))` — reproduced here as
  *    [[XXH64.hashUnsafeBytes]] over the gram's UTF-8 byte slice with
  *    Spark's fixed seed 42; positions are CODE-POINT positions, the
  *    same unit `substr`/`length` use.
  *  - selection = the frame minimum of struct(h, -pos) over the w
  *    positions ending at p, for every p >= w — i.e. smallest hash,
  *    rightmost on ties — exactly the deque's invariant (a new element
  *    pops every back element with h >= its own).
  *  - dedup: an element can win only a CONTIGUOUS run of windows (once
  *    a smaller hash enters, the deque discards it permanently), so
  *    suppressing consecutive repeats equals the old global
  *    `.distinct()` over (did, pos, fp).
  */
object WinnowKernels {
  private val EmptyArr = new GenericArrayData(Array.empty[Any])

  /** Selections for one document: array of struct(pos: int, fp: long),
    * `pos` the 1-based code-point start of the selected k-gram.
    * Documents with fewer than w full windows (numChars < k + w - 1)
    * select nothing — identical to the old plan's `pos >= w` filter
    * composed with its `length >= k` pre-filter.
    */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val nChars = s.numChars()
    if (nChars < k + w - 1) return EmptyArr
    val nBytes = s.numBytes()
    val base = s.getBaseObject
    val baseOff = s.getBaseOffset
    // byte offset of each code point start (offs(i) = start of char i)
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    var b = 0
    while (b < nBytes) {
      offs(ci) = b
      b += UTF8String.numBytesForFirstByte(Platform.getByte(base, baseOff + b))
      ci += 1
    }
    offs(nChars) = nBytes
    val g = nChars - k + 1 // number of k-grams; g >= w here
    // monotonic deque of (hash, pos), increasing by (h asc, pos desc)
    val dqH = new Array[Long](g)
    val dqP = new Array[Int](g)
    var head = 0
    var tail = 0
    val outP = new Array[Int](g)
    val outH = new Array[Long](g)
    var m = 0
    var lastSel = -1
    var p = 1
    while (p <= g) {
      val off = offs(p - 1)
      val h = XXH64.hashUnsafeBytes(base, baseOff + off,
        offs(p - 1 + k) - off, 42L)
      // rightmost-min tie-break: equal hashes prefer the LARGER pos,
      // so the incoming element also pops equal-hash predecessors
      while (tail > head && dqH(tail - 1) >= h) tail -= 1
      dqH(tail) = h
      dqP(tail) = p
      tail += 1
      while (dqP(head) <= p - w) head += 1
      if (p >= w && dqP(head) != lastSel) {
        lastSel = dqP(head)
        outP(m) = dqP(head)
        outH(m) = dqH(head)
        m += 1
      }
      p += 1
    }
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      rows(j) = InternalRow(outP(j), outH(j))
      j += 1
    }
    new GenericArrayData(rows)
  }
}

/** `winnow_select(text, k, w)` — [[WinnowKernels.winnow]] as one
  * codegen expression (the [[HashedNgramScore]] pattern: the per-gram
  * hash loop must not fall out of whole-stage codegen). Struct fields
  * are declared nullable so the exploded (pos, fp) columns carry the
  * same parquet nullability the previous window-aggregate plan
  * produced.
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType), StructField("fp", LongType))),
    containsNull = false)
  override def nullSafeEval(a: Any): Any =
    WinnowKernels.winnow(a.asInstanceOf[UTF8String], k, w)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowKernels.winnow($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object WinnowFunctions {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def winnowSelect(c: Column, k: Int, w: Int): Column =
    column(WinnowSelect(expression(c), k, w))
}
