package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV / bottom-k) distinct sketch, the mergeable
  * theta-sketch family (Beyer et al. 2007 "On Synopses for Distinct-
  * Value Estimation"; the Apache DataSketches theta sketch is the
  * production cousin — both public designs).
  *
  * Unlike HLL (which the engine already exposes via
  * `approx_count_distinct`, q96), a KMV sketch supports SET
  * INTERSECTION: keep the k smallest hash values per set; the k-th
  * smallest value estimates density (est ≈ (k-1)/u_k), and because the
  * retained values are an ACTUAL uniform sample of the hash space
  * below a computable threshold θ, two sketches intersect by counting
  * shared samples under min(θ_a, θ_b) — the operation HLL
  * fundamentally cannot do. That makes KMV the right sketch for
  * corpus-overlap questions at 100 TB ("how many users/documents do
  * these two sources share?") where the exact distinct-join would
  * shuffle both corpora.
  *
  * Plan shape: the sketch is a typed `Aggregator` with a bounded
  * (≤ k longs) buffer, so it partial-aggregates map-side — each task
  * reduces its partition to k values before the shuffle and the wire
  * carries |groups|·k longs, never the corpus. Merging two sketches is
  * a bounded merge of two sorted lists, so sketches roll up across
  * partitions, days, or sources for free.
  *
  * Determinism contract: hashes come from [[hash60]] — the top 60 bits
  * of md5 — NOT xxhash64, precisely so a SQL oracle (DuckDB
  * `CAST('0x' || substring(md5(x),1,15) AS BIGINT)`) reproduces every
  * value, threshold, and estimate bit-for-bit. The estimate arithmetic
  * sticks to IEEE-exact steps: int64→double casts and one multiply +
  * divide of exactly-representable doubles, then ROUND(·, 4).
  */
object Kmv {
  /** Hash-space size: hashes are 60-bit (15 hex digits of md5). */
  val SpaceSize: Double = 1152921504606846976.0 // 2^60, exact in double

  /** 60-bit md5 hash of a (string) key — the sketch's hash function.
    * `conv` parses the 15-hex-digit prefix to a decimal string; the
    * bigint cast is exact (60 bits < 63).
    */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("bigint")

  /** Bounded bottom-k buffer: ascending-sorted distinct hash values,
    * at most k. Insert/merge are O(k) — k is 64..1024 in practice, and
    * the O(k) constant buys Tungsten-friendly flat `Seq[Long]` state.
    */
  class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    private def insert(buf: Seq[Long], h: Long): Seq[Long] =
      if (buf.nonEmpty && h > buf.last && buf.size >= k) buf
      else if (buf.contains(h)) buf
      else if (buf.size < k) (buf :+ h).sorted
      else (buf.init :+ h).sorted
    override def reduce(buf: Seq[Long], h: Long): Seq[Long] = insert(buf, h)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(insert)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** (hash, value) pair for the value-carrying sample sketch. */
  case class HV(h: Long, v: Double)

  /** Bottom-k-BY-HASH uniform value sample — KMV's value-carrying
    * sibling: per group keep the rows whose `hash60` is among the k
    * smallest, with their measure values. Because membership is a pure
    * function of the hash order, the bottom-k of a UNION is the
    * bottom-k of the merged bottom-ks — a mergeable, bounded
    * (k · 16 B), deterministic sample any quantile can be estimated
    * from, re-executable in plain SQL (rank by the same md5 hash).
    * This is the quantile-sketch column to q235's distinct-count
    * sketch column: partial aggregation bounds every map task's
    * output at k rows, so the shuffle carries |groups| · k pairs.
    */
  class SampleAgg(k: Int) extends Aggregator[HV, Seq[HV], Seq[HV]] {
    override def zero: Seq[HV] = Vector.empty
    private def insert(buf: Seq[HV], x: HV): Seq[HV] =
      if (buf.size >= k && x.h > buf.last.h) buf
      else buf.indexWhere(_.h == x.h) match {
        // hash60 collision between distinct keys: keep the SMALLER
        // measure value so the retained pair is a pure function of the
        // multiset, not of partition/merge encounter order — the
        // q254 stream-equals-batch contract demands order independence
        case i if i >= 0 => if (x.v < buf(i).v) buf.updated(i, x) else buf
        case _ if buf.size < k => (buf :+ x).sortBy(_.h)
        case _ => (buf.init :+ x).sortBy(_.h)
      }
    override def reduce(buf: Seq[HV], x: HV): Seq[HV] = insert(buf, x)
    override def merge(a: Seq[HV], b: Seq[HV]): Seq[HV] =
      b.foldLeft(a)(insert)
    override def finish(r: Seq[HV]): Seq[HV] = r
    override def bufferEncoder: Encoder[Seq[HV]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HV]]()
    override def outputEncoder: Encoder[Seq[HV]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HV]]()
  }

  /** Per-group KMV sketch of `hash60(keyCol)`: (groupCol, mins) with
    * `mins` the ≤ k smallest distinct hash values, ascending.
    */
  def sketch(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    val agg = udaf(new KmvAgg(k), Encoders.scalaLong)
    graft.engine.Par.widen(df)
      .select(col(groupCol), hash60(col(keyCol)).as("_h"))
      .groupBy(col(groupCol))
      .agg(agg(col("_h")).as("mins"))
  }

  /** The sketch estimate as a column over a `mins` array: an
    * UNSATURATED sketch (fewer than k distinct values) holds every
    * value and the estimate is the exact count; a saturated one uses
    * the classic (k-1)/u_k with u_k = kth/2^60.
    */
  def estimate(mins: Column, k: Int): Column =
    when(size(mins) < k, size(mins).cast("double"))
      .otherwise(round(
        lit((k - 1).toDouble) * lit(SpaceSize) /
          element_at(mins, k).cast("double"), 4))

  /** Distinct-count estimate per group: (group, n_kept, kth_hash, est).
    * `kth_hash` is NULL while unsaturated (no threshold yet).
    */
  def distinctEstimate(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame =
    sketch(df, groupCol, keyCol, k)
      .select(col(groupCol),
        size(col("mins")).cast("bigint").as("n_kept"),
        when(size(col("mins")) >= k, element_at(col("mins"), k))
          .otherwise(lit(null).cast("bigint")).as("kth_hash"),
        estimate(col("mins"), k).as("est"))

  /** Intersection / Jaccard estimate between the per-group key sets of
    * two relations, from their KMV sketches only (the corpora never
    * join): θ = min of the two saturation thresholds (2^60 when a side
    * is unsaturated, i.e. complete); the retained values below θ on
    * each side are uniform hash-space samples, so
    * |shared below θ| / (θ/2^60) estimates the true intersection.
    * Output: (group, est_a, est_b, est_inter, est_jaccard) with
    * jaccard from inclusion–exclusion on the three estimates.
    */
  def intersectEstimate(dfA: DataFrame, dfB: DataFrame, groupCol: String,
      keyCol: String, k: Int): DataFrame = {
    val sa = sketch(dfA, groupCol, keyCol, k)
      .select(col(groupCol), col("mins").as("ma"))
    val sb = sketch(dfB, groupCol, keyCol, k)
      .select(col(groupCol), col("mins").as("mb"))
    overlap(sa.join(sb, Seq(groupCol)), k)
      .select(col(groupCol), col("est_a"), col("est_b"),
        col("est_inter"), col("est_jaccard"))
  }

  /** Theta-intersection estimates over a relation carrying two sketch
    * columns `ma`/`mb` (see [[intersectEstimate]] for the math).
    */
  private def overlap(pairs: DataFrame, k: Int): DataFrame = {
    val theta = least(
      when(size(col("ma")) < k, lit(SpaceSize))
        .otherwise(element_at(col("ma"), k).cast("double")),
      when(size(col("mb")) < k, lit(SpaceSize))
        .otherwise(element_at(col("mb"), k).cast("double")))
    val shared = size(filter(array_intersect(col("ma"), col("mb")),
      h => h.cast("double") < col("_theta")))
    pairs
      .withColumn("_theta", theta)
      .withColumn("est_a", estimate(col("ma"), k))
      .withColumn("est_b", estimate(col("mb"), k))
      .withColumn("est_inter",
        round(shared.cast("double") * lit(SpaceSize) / col("_theta"), 4))
      .withColumn("est_jaccard",
        round(col("est_inter") /
          (col("est_a") + col("est_b") - col("est_inter")), 4))
  }

  /** Full pairwise overlap matrix across groups — every (a < b) group
    * pair's intersection/Jaccard estimate from the per-group sketches
    * alone. The corpus is read ONCE (one sketch pass); the pairwise
    * stage is |groups|² rows of ≤ k longs each — at 100 TB that is the
    * difference between one linear scan + kilobytes of driver-free
    * sketch algebra and |groups|² corpus self-joins. The source-
    * overlap audit of a training-data mix ("which feeds duplicate each
    * other?") is exactly this shape.
    */
  def pairwiseOverlap(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    val sk = sketch(df, groupCol, keyCol, k)
    val a = sk.select(col(groupCol).as("a"), col("mins").as("ma"))
    val b = sk.select(col(groupCol).as("b"), col("mins").as("mb"))
    overlap(a.crossJoin(broadcast(b)).filter(col("a") < col("b")), k)
      .select(col("a"), col("b"), col("est_a"), col("est_b"),
        col("est_inter"), col("est_jaccard"))
  }
}
