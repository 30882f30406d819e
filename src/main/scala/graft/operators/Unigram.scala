package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram language-model tokenizer (Kudo 2018, the SentencePiece
  * unigram algorithm, public) — the other half of real tokenizer
  * training next to [[Bpe]]: a seed vocabulary of frequent substrings
  * is iteratively re-estimated (E-step: segment every word by Viterbi
  * under the current piece scores; M-step: piece probability =
  * usage / total) and pruned toward a target size, keeping single
  * characters always so every word stays segmentable. This is the
  * hard-EM (Viterbi-EM) variant: the E-step commits to the single
  * best segmentation instead of forward–backward expectations — a
  * documented simplification that keeps every count an integer and
  * the whole trainer deterministic.
  *
  * Determinism contract (what makes the apply path CROSS-ENGINE
  * certifiable, not just golden-pinned): scores are stored rounded to
  * 9 decimals; Viterbi compares dp(i) + s(piece) with ties broken by
  * fewer tokens, then smallest split start (= longest last piece).
  * dp sums combine the same doubles in the same structural order in
  * any engine, so an independent SQL replay of the DP over the same
  * stored scores reproduces every segmentation bit-for-bit.
  *
  * Scale design (mirrors [[Bpe]] exactly): the corpus-sized work is
  * ONE distributed word count (map-side combinable), truncated to the
  * `maxWords` most frequent words — only that vocab-bounded aggregate
  * reaches the driver; the EM loop runs in memory over the word
  * multiset, O(|words| · len · maxPieceLen) per iteration,
  * independent of corpus size. Apply is fully distributed: the piece
  * table (KBs) broadcasts, tokenization is a narrow partition-wise
  * pass with a per-partition word→tokens memo.
  */
object Unigram {

  /** Best segmentation of `word` under `score` (log-probabilities):
    * maximize the score sum; ties → fewer tokens, then the smallest
    * split start at each position (scanning starts ascending and
    * updating only on STRICT improvement keeps the first best — the
    * same argmax ORDER BY score DESC, ntoks ASC, start ASC an
    * independent replay uses). Single characters are always scored in
    * training, so a trained vocabulary segments everything; a truly
    * unknown character falls back to the whole word as one token.
    */
  private[operators] def viterbi(word: String,
      score: scala.collection.Map[String, Double],
      maxPieceLen: Int): Array[String] = {
    val n = word.length
    val NEG = Double.NegativeInfinity
    val dp = Array.fill(n + 1)(NEG)
    val ntok = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(-1)
    dp(0) = 0.0
    ntok(0) = 0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (dp(i) != NEG) {
          val s = score.getOrElse(word.substring(i, j), NEG)
          if (s != NEG) {
            val cand = dp(i) + s
            val candN = ntok(i) + 1
            if (cand > dp(j) || (cand == dp(j) && candN < ntok(j))) {
              dp(j) = cand; ntok(j) = candN; back(j) = i
            }
          }
        }
        i += 1
      }
      j += 1
    }
    if (dp(n) == NEG) Array(word)
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = n
      while (p > 0) { out += word.substring(back(p), p); p = back(p) }
      out.reverseIterator.toArray
    }
  }

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Train the piece table: Seq of (piece, logProb rounded to 9
    * decimals), sorted by (logProb desc, piece asc). `targetVocab`
    * bounds the MULTI-character pieces kept; single characters ride
    * along for free (segmentability).
    */
  def train(docs: DataFrame, textCol: String, targetVocab: Int,
      maxPieceLen: Int = 6, emIters: Int = 4, seedMultiplier: Int = 4,
      maxWords: Int = 1 << 20): Seq[(String, Double)] = {
    // distributed phase: word multiset, most-frequent-first
    val wc: Array[(String, Long)] = docs
      .select(explode(TextOps.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // seed: every substring ≤ maxPieceLen weighted by word frequency;
    // all single chars + the seedMultiplier×target most frequent multis
    val subFreq = new java.util.HashMap[String, Long]()
    wc.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          subFreq.merge(w.substring(i, i + l), f, _ + _)
          l += 1
        }
        i += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val all = subFreq.asScala.toSeq
    val chars = all.filter(_._1.length == 1)
    var multis = all.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
      .take(seedMultiplier * targetVocab)

    def scoresOf(counts: Seq[(String, Long)]): Map[String, Double] = {
      val total = counts.map(_._2).sum.toDouble.max(1.0)
      // a zero-count piece (a char the E-step never chose alone) keeps
      // a floor of half a count so it stays usable for unseen words
      counts.map { case (p, c) =>
        p -> round9(math.log((if (c == 0L) 0.5 else c.toDouble) / total))
      }.toMap
    }

    var charCounts = chars
    var iter = 0
    while (iter < emIters) {
      val score = scoresOf(charCounts ++ multis)
      // E-step: hard counts from the Viterbi segmentation of each word
      val used = new java.util.HashMap[String, Long]()
      wc.foreach { case (w, f) =>
        viterbi(w, score, maxPieceLen).foreach(used.merge(_, f, _ + _))
      }
      charCounts = chars.map { case (p, _) =>
        (p, used.getOrDefault(p, 0L)) }
      // M-step + prune: SentencePiece's shrink-toward-target — drop
      // the lowest-usage quarter of multis each round, never below
      // target; (count desc, piece asc) is the deterministic order
      val rescored = multis.map { case (p, _) =>
        (p, used.getOrDefault(p, 0L)) }
        .sortBy { case (p, c) => (-c, p) }
      val keep = math.max(targetVocab, (rescored.size * 3) / 4)
      multis = rescored.take(keep).filter(_._2 > 0L)
      iter += 1
    }
    scoresOf(charCounts ++ multis).toSeq
      .sortBy { case (p, s) => (-s, p) }
  }

  /** Train as a DataFrame (piece, log_prob) — the frozen artifact a
    * pipeline persists and an independent replay reads back.
    */
  def trainTable(docs: DataFrame, textCol: String, targetVocab: Int,
      maxPieceLen: Int = 6, emIters: Int = 4): DataFrame = {
    val s = docs.sparkSession
    val rows = train(docs, textCol, targetVocab, maxPieceLen, emIters)
      .map { case (p, lp) => Row(p, lp) }
    val schema = StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("log_prob", DoubleType, nullable = false)))
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
  }

  /** Per-document LM score for PERPLEXITY FILTERING (the CCNet/
    * FineWeb quality-gate shape): (idCol, n_tokens, score_micro)
    * where score_micro = Σ over words of
    * floor(word_viterbi_logprob × 10⁶) — an exact INTEGER, so
    * per-document and per-group sums are order-independent and an
    * independent replay lands on the identical value (a float sum
    * across words would be aggregation-order-dependent; floor of a
    * bit-identical double is not). A document's mean log-prob per
    * token is then score_micro / n_tokens / 10⁶, computed identically
    * anywhere. Same distributed shape as [[tokenize]].
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      pieces: Seq[(String, Double)], maxPieceLen: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(pieces.toMap)
    // An UNSEGMENTABLE word (a char outside the trained vocab) falls
    // back to one whole-word token; scoring that token 0.0 would hand
    // a fully out-of-vocab document mean_lp = 0 — trivially PASSING a
    // perplexity gate it should fail. Penalize it below every real
    // piece instead: min piece score minus a wide margin. (min − 10.0)
    // is two plain IEEE ops on a stored round9 double, so an
    // independent SQL replay lands on the identical micro integer.
    val unkPenalty =
      if (pieces.isEmpty) -100.0 else pieces.map(_._2).min - 10.0
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("score_micro", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    graft.engine.Par.widen(docs).select(col(idCol), col(textCol))
      .mapPartitions { it =>
        val score = bc.value
        val memo = new scala.collection.mutable.HashMap[String, (Int, Long)]
        it.map { row =>
          var n = 0L
          var micro = 0L
          row.getString(1).split(" ").foreach { w =>
            if (w.nonEmpty) {
              val (nt, m) = memo.getOrElseUpdate(w, {
                val toks = viterbi(w, score, maxPieceLen)
                // left-to-right fold = the DP's own addition order,
                // so the double is bit-identical to dp(n)
                var s = 0.0
                toks.foreach(t => s += score.getOrElse(t, unkPenalty))
                (toks.length, math.floor(s * 1e6).toLong)
              })
              n += nt; micro += m
            }
          }
          Row(row.getLong(0), n, micro)
        }
      }(enc)
  }

  /** Distributed apply: (idCol, n_tokens, toks) per document under the
    * frozen piece table — [[Bpe.tokenize]]'s exact shape (broadcast
    * table, narrow pass, per-partition word memo).
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      pieces: Seq[(String, Double)], maxPieceLen: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(pieces.toMap)
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("toks", StringType, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    graft.engine.Par.widen(docs).select(col(idCol), col(textCol))
      .mapPartitions { it =>
        val score = bc.value
        val memo = new scala.collection.mutable.HashMap[String, Array[String]]
        it.map { row =>
          val sb = new java.lang.StringBuilder
          var n = 0L
          row.getString(1).split(" ").foreach { w =>
            if (w.nonEmpty) {
              val toks = memo.getOrElseUpdate(w, viterbi(w, score, maxPieceLen))
              var i = 0
              while (i < toks.length) {
                if (sb.length > 0) sb.append(' ')
                sb.append(toks(i))
                n += 1; i += 1
              }
            }
          }
          Row(row.getLong(0), n, sb.toString)
        }
      }(enc)
  }
}
