package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram language model (Kneser & Ney 1995;
  * the Chen & Goodman 1998 interpolated formulation) — the standard
  * n-gram smoothing for LM-based quality filtering, one rung above the
  * Jelinek–Mercer interpolation in [[TextOps.bigramLogProb]]: instead
  * of backing off to raw unigram FREQUENCY, KN backs off to the
  * CONTINUATION count — how many distinct left contexts a word
  * completes — which stops high-frequency-but-context-bound words
  * ("Francisco") from absorbing backoff mass:
  *
  *   P(w2|w1) = max(c(w1 w2) − D, 0) / c(w1 ·)
  *            + D · N1+(w1 ·) / c(w1 ·) · P_cont(w2)
  *   P_cont(w2) = N1+(· w2) / N1+(· ·)
  *
  * Split into a MODEL artifact and an APPLY pass, the q326/q327
  * tokenizer pattern:
  *
  *  - [[model]] emits the count relation: per seen bigram its count
  *    and the per-w1 / per-w2 / global continuation statistics —
  *    ALL exact integers, so the model table is fully certifiable by
  *    an independent SQL replay (no golden pin needed);
  *  - [[scoreDocs]] scores each document as the SUM of micro-unit
  *    integer log-probabilities (floor(1e6·ln P) per bigram, with the
  *    backoff-only case decomposed as floor(1e6·ln backoff_w1) +
  *    floor(1e6·ln P_cont(w2)) — a FIXED decomposition, so engine and
  *    oracle add the same integers in any order; a double sum across
  *    bigrams would be aggregation-order-dependent, the q212/q330
  *    lesson). Words absent from the model entirely (true OOV) take
  *    an explicit large penalty rather than silently scoring 0 — the
  *    q330 advisor lesson.
  *
  * Plan shape for 100 TB: the model is one map-side-combinable
  * groupBy off ONE tokenize pass, with the per-w1/per-w2 statistics
  * as window aggregates over the resulting bigram-type relation —
  * nothing wider than (w1, w2, count) shuffles, and nothing shuffles
  * more than three times; the N1+(··) scalar rides as a broadcast
  * one-row cross join. Apply joins each doc's DISTINCT bigram tf against the model
  * on (w1, w2) — an equi-join on the model's own key that AQE
  * broadcasts when the vocabulary fits, and the raw token stream is
  * never joined.
  */
object KneserNey {

  /** Absolute discount. 0.75 is the textbook default; held fixed so
    * the micro-unit scores are a pure function of the count relation.
    */
  val Discount = 0.75

  /** Micro-unit penalty for a bigram whose LEFT word was never seen
    * as a history (true OOV under the model): ln(1e-9) in micro-units
    * — large, negative, and fixed, mirrored exactly in the oracle.
    */
  val OovPenaltyMicro: Long = math.floor(1e6 * math.log(1e-9)).toLong

  private def bigramsOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ws = TextOps.words(col(textCol))
    val pairs = zip_with(slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    docs.filter(size(ws) >= 2)
      .select(col(idCol).as("id"), explode(pairs).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
  }

  /** The KN count relation — one row per SEEN bigram carrying every
    * statistic the probability needs, all exact integers:
    * `c2` = c(w1 w2), `c1` = c(w1 ·), `n1p_fwd` = N1+(w1 ·),
    * `n1p_bwd` = N1+(· w2), `n1p_all` = N1+(· ·).
    */
  def model(docs0: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.engine.Par.widen(docs0)
    val bg = bigramsOf(docs, idCol, textCol)
    val c2 = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    // per-w1 and per-w2 statistics as WINDOW aggregates over the c2
    // relation instead of groupBy+join-back (r16, the SuffixDedup /
    // PageRank share-one-exchange rewrite): the r15 shape aggregated
    // c2 twice and joined both results back — two aggregate exchanges
    // plus two |bigram-types| join re-exchanges; the windows pay one
    // exchange each and no join. Values are bit-identical (same sums
    // and counts over the same groups — probe-checked diff=0).
    // Skew note: one w1 group (a function word's continuation set) is
    // bounded by |vocab| rows and buffers in a spillable
    // ExternalAppendOnlyUnsafeRowArray — same rows the old join-back
    // co-located in one task.
    val all = c2.agg(count(lit(1)).as("n1p_all"))
    c2.withColumn("c1", sum(col("c2")).over(Window.partitionBy(col("w1"))))
      .withColumn("n1p_fwd",
        count(lit(1)).over(Window.partitionBy(col("w1"))))
      .withColumn("n1p_bwd",
        count(lit(1)).over(Window.partitionBy(col("w2"))))
      .crossJoin(broadcast(all))
      .select(col("w1"), col("w2"), col("c2"), col("c1"),
        col("n1p_fwd"), col("n1p_bwd"), col("n1p_all"))
  }

  /** floor(1e6 · ln x) as a LONG column — the micro-unit quantizer.
    * Operand structure is pinned: `x` must be built the same way on
    * both engines (a ratio of exact integers), so the double `ln`
    * sees bit-identical input.
    */
  private def lnMicro(x: Column): Column =
    floor(lit(1e6) * log(x)).cast("long")

  /** Score documents under a trained `model`: per doc the bigram
    * count and the SUM of micro-unit log-probs (order-independent
    * LONG). Seen bigram → one quantized term; unseen bigram with a
    * seen history → quantized backoff weight + quantized continuation
    * (two pinned integers); unseen history → [[OovPenaltyMicro]].
    */
  def scoreDocs(docs0: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val tf = bigramsOf(docs, idCol, textCol)
      .groupBy(col("id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    // per-history backoff weight ln(D · n1p_fwd / c1) and per-word
    // continuation ln(n1p_bwd / n1p_all) — each quantized ALONE so
    // the unseen-bigram score is the sum of two pinned integers
    val byW1 = model.groupBy(col("w1"))
      .agg(first(col("c1")).as("c1"), first(col("n1p_fwd")).as("n1p_fwd"))
    val byW2 = model.groupBy(col("w2"))
      .agg(first(col("n1p_bwd")).as("n1p_bwd"),
        first(col("n1p_all")).as("n1p_all"))
    val seen = model.select(col("w1"), col("w2"),
      lnMicro((col("c2") - lit(Discount)) / col("c1") +
        lit(Discount) * col("n1p_fwd") / col("c1") *
          col("n1p_bwd") / col("n1p_all")).as("lp_seen"))
    val bw = byW1.select(col("w1"),
      lnMicro(lit(Discount) * col("n1p_fwd") / col("c1")).as("bw_micro"))
    val cont = byW2.select(col("w2"),
      lnMicro(col("n1p_bwd") / col("n1p_all")).as("cont_micro"))
    tf.join(seen, Seq("w1", "w2"), "left")
      .join(bw, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .withColumn("lp_micro",
        coalesce(col("lp_seen"),
          col("bw_micro") + col("cont_micro"),
          lit(OovPenaltyMicro)))
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("lp_micro")).as("score_micro"))
      .select(col("id").as(idCol), col("n_bigrams"), col("score_micro"))
  }
}
