package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Rank-error quantile sketch — the mergeable compactor design of
  * KLL (Karnin–Lang–Liberty 2016, "Optimal Quantile Approximation in
  * Streams"; Apache DataSketches' production quantile sketch) in its
  * DETERMINISTIC variant (Manku–Rajagopalan–Lindsay 1998 compaction
  * with an alternating selector instead of a random coin), chosen so
  * the same inputs always produce the same sketch — the engine's
  * oracle-reproducibility house rule.
  *
  * Structure: a stack of levels; level h holds values of WEIGHT 2^h,
  * each level capped at k. Inserts land in level 0; an over-full
  * level sorts itself and promotes every other element (alternating
  * offset per level, tracked in a flip bitmask) to the level above at
  * double weight, discarding the rest — one compaction perturbs any
  * rank by at most w_h = 2^h, and level h compacts at most
  * 2n/(w_h·k) times, so the total rank error is bounded by
  *
  *   ε(k, n) ≤ 2·(⌈log₂(n/k)⌉ + 2) / k        (certified in SketchSpec)
  *
  * — the deterministic MRL bound; the randomized KLL coin would
  * tighten it to O(1/k) in expectation at the cost of reproducibility.
  * A sketch with n ≤ k items is EXACT (nothing ever compacts).
  *
  * Scale shape: a typed `Aggregator` with a bounded (≤ k·levels
  * doubles) buffer — partial-aggregates map-side, so each task ships
  * one sketch per group, never the rows; sketches MERGE (pairwise
  * level concat + compaction), so per-day / per-source sketches roll
  * up without touching data, under the SAME ε contract (compaction
  * arrangement differs with merge order, so rollup and direct agree
  * to ε, not bit-for-bit — the bound, not the arrangement, is the
  * production contract). Quantile evaluation is pure Catalyst array
  * algebra over the finished sketch (no UDF in the read path).
  */
object Kll {

  /** Sketch state: `levels(h)` holds weight-2^h values (level 0 may
    * be unsorted between compactions); bit h of `flips` is level h's
    * next alternating selector.
    */
  case class KllState(levels: Seq[Seq[Double]], flips: Long)

  /** Certified worst-case rank error of a k-sketch over n items. */
  def epsilon(k: Int, n: Long): Double =
    2.0 * (math.ceil(math.log(math.max(n.toDouble / k, 1.0)) /
      math.log(2.0)) + 2.0) / k

  private def compact(levels: Vector[Vector[Double]], flips: Long,
      k: Int): (Vector[Vector[Double]], Long) = {
    var ls = levels
    var fl = flips
    var h = 0
    while (h < ls.size) {
      if (ls(h).size > k) {
        val sorted = ls(h).sorted
        // odd count: the largest stays behind so total weight is
        // conserved (a deterministic function of the multiset)
        val (even, stay) =
          if (sorted.size % 2 == 1) (sorted.init, Vector(sorted.last))
          else (sorted, Vector.empty[Double])
        val off = ((fl >> h) & 1L).toInt
        val promoted = Vector.tabulate(even.size / 2)(i => even(2 * i + off))
        ls = ls.updated(h, stay)
        ls = if (h + 1 < ls.size) ls.updated(h + 1, ls(h + 1) ++ promoted)
             else ls :+ promoted
        fl ^= (1L << h)
      }
      h += 1
    }
    (ls, fl)
  }

  /** Per-group KLL sketch of a double column. Output column is the
    * raw state (struct of levels + flips) so sketches stay MERGEABLE
    * downstream — re-aggregate with [[KllMergeAgg]] for rollups.
    */
  class KllAgg(k: Int) extends Aggregator[Double, KllState, KllState] {
    require(k >= 8, s"k must be at least 8, got $k")
    override def zero: KllState = KllState(Vector(Vector.empty), 0L)
    override def reduce(s: KllState, v: Double): KllState = {
      val ls = s.levels.toVector.map(_.toVector)
      val (c, f) = compact(ls.updated(0, ls(0) :+ v), s.flips, k)
      KllState(c, f)
    }
    override def merge(a: KllState, b: KllState): KllState = {
      val h = math.max(a.levels.size, b.levels.size)
      val la = a.levels.toVector.map(_.toVector)
        .padTo(h, Vector.empty[Double])
      val lb = b.levels.toVector.map(_.toVector)
        .padTo(h, Vector.empty[Double])
      val (c, f) = compact(
        la.zip(lb).map { case (x, y) => x ++ y }, a.flips ^ b.flips, k)
      KllState(c, f)
    }
    override def finish(s: KllState): KllState = s
    override def bufferEncoder: Encoder[KllState] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllState]()
    override def outputEncoder: Encoder[KllState] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllState]()
  }

  /** Merge already-built sketches (the rollup aggregator): same merge
    * and compaction as [[KllAgg]], inputs are states.
    */
  class KllMergeAgg(k: Int)
    extends Aggregator[KllState, KllState, KllState] {
    private val inner = new KllAgg(k)
    override def zero: KllState = inner.zero
    override def reduce(s: KllState, x: KllState): KllState =
      inner.merge(s, x)
    override def merge(a: KllState, b: KllState): KllState =
      inner.merge(a, b)
    override def finish(s: KllState): KllState = s
    override def bufferEncoder: Encoder[KllState] = inner.bufferEncoder
    override def outputEncoder: Encoder[KllState] = inner.outputEncoder
  }

  /** Per-group sketch: (groupCol, sketch). */
  def sketch(df: DataFrame, groupCol: String, valCol: String,
      k: Int): DataFrame = {
    val agg = udaf(new KllAgg(k), Encoders.scalaDouble)
    graft.engine.Par.widen(df)
      .select(col(groupCol), col(valCol).cast("double").as("_v"))
      .groupBy(col(groupCol))
      .agg(agg(col("_v")).as("sketch"))
  }

  /** The sketch as a sorted (v, w) weighted-sample array — pure
    * Catalyst: flatten levels with their 2^h weights, array_sort.
    */
  def weighted(sketch: Column): Column =
    array_sort(flatten(transform(sketch.getField("levels"),
      (lvl, h) => transform(lvl, v =>
        struct(v.as("v"), pow(lit(2.0), h.cast("double")).as("w"))))))

  /** Total weight of a sketch — equals the sketched item count. */
  def totalWeight(sketch: Column): Column =
    aggregate(weighted(sketch), lit(0.0),
      (acc, x) => acc + x.getField("w"))

  /** Quantile estimate: the smallest sketched value whose cumulative
    * weight reaches ⌈q·W⌉ — one fold over the bounded (v, w) array,
    * whole-stage-codegen friendly, no UDF.
    */
  def quantile(sketch: Column, q: Double): Column = {
    val pairs = weighted(sketch)
    val target = greatest(ceil(lit(q) * totalWeight(sketch)), lit(1L))
      .cast("double")
    aggregate(pairs,
      struct(lit(0.0).as("cum"), lit(null).cast("double").as("ans")),
      (acc, x) => {
        val cum = acc.getField("cum") + x.getField("w")
        struct(cum.as("cum"),
          when(acc.getField("ans").isNull && cum >= target,
            x.getField("v")).otherwise(acc.getField("ans")).as("ans"))
      }).getField("ans")
  }
}
