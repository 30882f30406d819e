package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, public
  * algorithm): train a merge table on the corpus, then tokenize
  * documents with the frozen merges — the real token counter behind
  * packing / context-window budgeting, replacing the regex stand-in.
  *
  * Apply semantics (the deterministic, cross-engine-reproducible
  * variant): a word starts as its character sequence; merges apply in
  * rank order, each as ONE greedy left-to-right pass replacing every
  * non-overlapping (l, r) adjacency with the concatenation. This is a
  * pure function of (word, merges) — the DuckDB oracle re-executes it
  * independently via a recursive CTE over the same merge table, so the
  * tokenizer's apply path is certified end-to-end across engines, not
  * golden-pinned.
  *
  * Scale design (how production tokenizer training actually runs):
  * the corpus-sized work — word extraction and counting — is one
  * map-side-combinable distributed groupBy; 100 TB of text collapses
  * to a vocabulary multiset bounded by |distinct words| (further
  * bounded by `maxVocab`, most-frequent-first), and ONLY that
  * aggregate is collected. The merge loop then runs in memory over
  * the word-count table — O(maxVocab · avg word length) per rank,
  * independent of corpus size — exactly the two-phase shape of
  * public BPE trainers (distributed count, single-node merge loop).
  * Apply is fully distributed: the merge table (a few KB) broadcasts,
  * tokenization is a narrow partition-wise pass with a per-partition
  * word -> tokens memo (natural-language word frequency makes the memo
  * hit rate high), and nothing wider than (id, n_tokens, toks) is
  * produced.
  */
object Bpe {

  /** One greedy left-to-right pass: every non-overlapping (l, r)
    * adjacency becomes the concatenated token. Merging never creates a
    * new (l, r) adjacency (the merged token is strictly longer than l
    * and r), so a single pass reaches the fixpoint for its rank.
    */
  private[operators] def mergePair(toks: Array[String], l: String,
      r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toArray
  }

  /** Tokenize one word: chars, then merges in rank order. */
  private[operators] def applyMerges(word: String,
      merges: Array[(String, String)]): Array[String] = {
    var toks = word.map(_.toString).toArray
    var m = 0
    while (m < merges.length && toks.length > 1) {
      toks = mergePair(toks, merges(m)._1, merges(m)._2)
      m += 1
    }
    toks
  }

  /** Learned merges in rank order, with the pair's corpus frequency at
    * the time it was chosen. Ties break deterministically: highest
    * count, then lexicographically smallest (l, r).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 1 << 20): Seq[(String, String, Long)] = {
    // corpus-scale phase: distributed word count (map-side combinable),
    // truncated to the maxVocab most frequent words (count desc, word
    // asc — deterministic). Only this vocab-bounded aggregate reaches
    // the driver.
    val wc = docs
      .select(explode(TextOps.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxVocab)
      .collect()
    var vocab: Array[(Array[String], Long)] =
      wc.map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    val merges = Seq.newBuilder[(String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // Count over (l, r) tuples directly — no joined string key, so
      // tokens containing ANY character (including control chars) keep
      // unambiguous pair identity and the documented tuple-lexicographic
      // (count desc, l asc, r asc) tie-break.
      val counts = new java.util.HashMap[(String, String), Long]()
      vocab.foreach { case (toks, c) =>
        var i = 0
        while (i + 1 < toks.length) {
          counts.merge((toks(i), toks(i + 1)), c, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var bestL: String = null
        var bestR: String = null
        var bestC = -1L
        counts.forEach { (k, c) =>
          if (c > bestC || (c == bestC &&
              (k._1 < bestL || (k._1 == bestL && k._2 < bestR)))) {
            bestL = k._1; bestR = k._2; bestC = c
          }
        }
        val (l, r) = (bestL, bestR)
        merges += ((l, r, bestC))
        vocab = vocab.map { case (toks, c) => (mergePair(toks, l, r), c) }
        rank += 1
      }
    }
    merges.result()
  }

  /** Train as a DataFrame (mrank, l, r, cnt) — the frozen-merge-table
    * artifact a pipeline persists and the oracle reads back.
    */
  def trainTable(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 1 << 20): DataFrame = {
    val s = docs.sparkSession
    val rows = train(docs, textCol, numMerges, maxVocab).zipWithIndex.map {
      case ((l, r, c), i) => Row(i + 1, l, r, c)
    }
    val schema = StructType(Seq(
      StructField("mrank", IntegerType, nullable = false),
      StructField("l", StringType, nullable = false),
      StructField("r", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false)))
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
  }

  /** Distributed apply: (idCol, n_tokens, toks) per document under the
    * frozen merges. Narrow partition-wise transform; merges broadcast;
    * per-partition word memo.
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(merges.toArray)
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("toks", StringType, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    graft.engine.Par.widen(docs).select(col(idCol), col(textCol))
      .mapPartitions { it =>
        val ms = bc.value
        val memo = new scala.collection.mutable.HashMap[String, Array[String]]
        it.map { row =>
          val sb = new java.lang.StringBuilder
          var n = 0L
          row.getString(1).split(" ").foreach { w =>
            if (w.nonEmpty) {
              val toks = memo.getOrElseUpdate(w, applyMerges(w, ms))
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
