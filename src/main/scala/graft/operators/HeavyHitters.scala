package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact heavy hitters over an unbounded key domain in two passes —
  * the "which tokens/URLs/users exceed x% of all traffic" question at
  * a scale where `groupBy(key).count` would shuffle the entire
  * distinct domain just to discard almost all of it.
  *
  * Pass 1 is a Misra-Gries summary as a typed `Aggregator` (mergeable
  * summaries, Agarwal et al., PODS'12): each map task compresses its
  * partition to at most `cap` weighted candidates, so the shuffle
  * carries O(numPartitions · cap) rows — never the distinct domain.
  * The MG guarantee (any key with true frequency > n/(cap+1) survives
  * every decrement, under ANY merge order) makes the candidate set a
  * superset of the answer even though its exact membership is
  * merge-order-dependent.
  *
  * Pass 2 makes the result exact and deterministic: count ONLY the
  * broadcast candidate keys (a shuffle of ≤cap distinct keys) and keep
  * those with exact count > n·fraction. Nondeterministic candidate
  * extras are filtered out by their exact counts, so the OUTPUT is a
  * pure function of the data — which is what lets an approximation-
  * assisted plan be SQL-oracle-checked row-for-row.
  */
object HeavyHitters {

  /** Misra-Gries buffer: key -> residual weight, at most `cap` keys. */
  class MisraGries(cap: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    require(cap >= 1, "cap must be >= 1")

    // Decrement trick shared by reduce and merge: if over capacity,
    // subtract the (cap+1)-th largest weight from everything and drop
    // the non-positive rest. Total decrement across the run is bounded
    // by n/(cap+1), which is the survival guarantee.
    private def shrink(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= cap) m
      else {
        // The reduce path overflows by exactly one key, so the
        // (cap+1)-th largest of the cap+1 values IS the minimum — one
        // O(cap) scan, no per-row array sort (on a distinct-heavy tail
        // every row overflows, so the sort was O(cap log cap)/row).
        // The general selection remains for merge, which can be up to
        // 2*cap wide but runs once per merged summary pair, not per row.
        val cut =
          if (m.size == cap + 1) m.valuesIterator.min
          else m.valuesIterator.toArray.sorted(Ordering[Long].reverse)(cap)
        m.collect { case (k, v) if v > cut => k -> (v - cut) }
      }

    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], k: String): Map[String, Long] =
      shrink(b.updated(k, b.getOrElse(k, 0L) + 1L))
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      shrink(b.foldLeft(a) { case (m, (k, v)) =>
        m.updated(k, m.getOrElse(k, 0L) + v)
      })
    override def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Per-GROUP exact heavy hitters: keys of `keyCol` whose exact count
    * exceeds `fraction` of their group's rows — "top tokens per
    * language", "hot URLs per tenant". Same two-pass contract as
    * [[exactOverThreshold]], with one MG summary per group riding a
    * single map-side-combinable aggregation (state: |groups| bounded
    * maps), and the recount join keyed on (group, key). The candidate
    * side stays ≤ |groups|·cap rows — broadcastable for any realistic
    * group count; at extreme |groups| the exact join degrades to a
    * shuffle join on the same bounded relation, never the raw domain.
    */
  def exactOverThresholdByGroup(df0: DataFrame, groupCol: String,
      keyCol: String, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction < 1, s"bad fraction $fraction")
    val cap = math.ceil(1.0 / fraction).toInt - 1
    val df = graft.engine.Par.widen(df0)
      .select(col(groupCol).as("g"), col(keyCol).as("k"))
    val mg = udaf(new MisraGries(cap), Encoders.STRING)
    val pass1 = df.groupBy(col("g"))
      .agg(mg(col("k")).as("cand"), count(lit(1)).as("n"))
    val cand = pass1.select(col("g"), explode(col("cand")).as("k"), col("n"))
    df.join(broadcast(cand), Seq("g", "k"))
      .groupBy(col("g"), col("k"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > col("n") * fraction)
      .select(col("g").as(groupCol), col("k").as("key"), col("cnt"))
  }

  /** Keys of `keyCol` whose exact count exceeds `fraction` of all rows,
    * with their exact counts: (key, cnt). `fraction` must be ≥ some
    * sane floor (cap = ceil(1/fraction) - 1 candidates are buffered
    * per map task).
    */
  def exactOverThreshold(df0: DataFrame, keyCol: String,
      fraction: Double): DataFrame = {
    require(fraction > 0 && fraction < 1, s"bad fraction $fraction")
    val cap = math.ceil(1.0 / fraction).toInt - 1
    val df = graft.engine.Par.widen(df0).select(col(keyCol).as("k"))
    val mg = udaf(new MisraGries(cap), Encoders.STRING)
    // one pass: MG candidates + exact n, in the same partial aggregation
    val pass1 = df.agg(mg(col("k")).as("cand"), count(lit(1)).as("n"))
    val cand = pass1.select(explode(col("cand")).as("k"), col("n"))
    // pass 2: exact counts of ≤cap keys; the stream is filtered by the
    // broadcast candidate set BEFORE its shuffle
    df.join(broadcast(cand), "k")
      .groupBy(col("k"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > col("n") * fraction)
      .select(col("k").as("key"), col("cnt"))
  }
}
