package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def bruteBest(word: String, score: Map[String, Double],
      maxLen: Int): (Double, Int) = {
    // enumerate every segmentation; return (best score, tokens at best)
    // under the same tie-break (score desc, tokens asc)
    def go(i: Int): Seq[(Double, Int)] =
      if (i == word.length) Seq((0.0, 0))
      else (1 to math.min(maxLen, word.length - i)).flatMap { l =>
        val p = word.substring(i, i + l)
        score.get(p).toSeq.flatMap(s =>
          go(i + l).map { case (sc, nt) => (sc + s, nt + 1) })
      }
    go(0).sortBy { case (sc, nt) => (-sc, nt) }.head
  }

  test("viterbi matches exhaustive enumeration and reconstructs the word") {
    val score = Map("a" -> -3.0, "b" -> -3.5, "c" -> -4.0, "ab" -> -2.0,
      "bc" -> -2.5, "abc" -> -5.0, "ca" -> -1.5, "aa" -> -2.2)
    val words = Seq("a", "ab", "abc", "abcab", "caab", "aaaa", "cabcab",
      "bca", "abcabcab")
    words.foreach { w =>
      val seg = Unigram.viterbi(w, score, maxPieceLen = 3)
      assert(seg.mkString("") == w, s"concat invariant broke for $w")
      val got = (seg.map(score).sum, seg.length)
      val want = bruteBest(w, score, 3)
      assert(got == want, s"$w: viterbi=$got brute=$want seg=${seg.toSeq}")
    }
    // unknown character: whole word falls back to one token
    assert(Unigram.viterbi("xyz", score, 3).toSeq == Seq("xyz"))
  }

  test("training is deterministic and EM never decreases corpus likelihood") {
    val docs = t("documents")
    val p1 = Unigram.train(docs, "text", targetVocab = 24)
    val p2 = Unigram.train(docs, "text", targetVocab = 24)
    assert(p1 == p2)
    assert(p1.map(_._1).distinct.size == p1.size)
    // every single character of the corpus survives training
    val chars = docs.select(explode(graft.operators.TextOps
        .words(col("text"))).as("w"))
      .select(explode(split(col("w"), "")).as("c"))
      .filter(col("c") =!= "").distinct()
      .collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(p1.map(_._1).toSet))
    // Viterbi-EM monotonicity holds on a FIXED vocabulary (the prune
    // step between training iterations deliberately trades likelihood
    // for vocab size — SentencePiece's contract — so cross-iteration
    // likelihood may dip): one extra E+M pass over the FINAL piece
    // set must not decrease the max-segmentation corpus likelihood
    val wc = docs.select(explode(graft.operators.TextOps
        .words(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def ll(m: Map[String, Double]): Double =
      wc.map { case (w, f) =>
        f * Unigram.viterbi(w, m, 6).map(m.getOrElse(_, -100.0)).sum
      }.sum
    val m0 = p1.toMap
    // E-step: usage counts under m0; M-step: rescore the same set
    val used = new java.util.HashMap[String, Long]()
    wc.foreach { case (w, f) =>
      Unigram.viterbi(w, m0, 6).foreach(used.merge(_, f, _ + _)) }
    val total = {
      import scala.jdk.CollectionConverters._
      used.values.asScala.map(_.toLong).sum.toDouble.max(1.0)
    }
    val m1 = p1.map { case (p, _) =>
      val c = used.getOrDefault(p, 0L)
      p -> math.log((if (c == 0L) 0.5 else c.toDouble) / total)
    }.toMap
    // epsilon: stored scores are rounded to 9 decimals and the
    // 0.5-floor smoothing makes the M-step slightly off exact MLE —
    // both contribute O(1e-9 × corpus tokens) ≈ 1e-3 drift; a real
    // EM violation would be O(1) or larger
    assert(ll(m1) >= ll(m0) - 1e-2,
      s"fixed-vocab EM step decreased likelihood: ${ll(m0)} -> ${ll(m1)}")
    // pruning shrinks the multi-piece vocab monotonically toward target
    val sizes = (1 to 4).map(k =>
      Unigram.train(docs, "text", targetVocab = 24, emIters = k)
        .count(_._1.length > 1))
    sizes.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
  }

  test("tokenize is partitioning-invariant and consistent with viterbi") {
    val docs = t("documents")
    val pieces = Unigram.train(docs, "text", targetVocab = 24)
    def roll(df: org.apache.spark.sql.DataFrame) =
      Unigram.tokenize(df, "doc_id", "text", pieces)
        .agg(sum(col("n_tokens")), count(lit(1)),
          expr("bit_xor(CAST(conv(substring(md5(concat(doc_id, '|', "
            + "toks)), 1, 15), 16, 10) AS BIGINT))"))
        .head()
    assert(roll(docs) == roll(docs.repartition(17)))
    // tokens per word agree with a direct viterbi call
    val m = pieces.toMap
    val one = Unigram.tokenize(docs.limit(5), "doc_id", "text", pieces)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .collect()
    one.foreach { r => // (doc_id, n_tokens, toks, text)
      val want = r.getString(3).split(" ").filter(_.nonEmpty)
        .flatMap(Unigram.viterbi(_, m, 6)).mkString(" ")
      assert(r.getString(2) == want)
    }
  }

  test("out-of-vocab words score BELOW every in-vocab doc (quality gate)") {
    import spark.implicits._
    val docs = t("documents")
    val pieces = Unigram.train(docs, "text", targetVocab = 24)
    // a fully out-of-vocab document (chars the training corpus never
    // saw) must FAIL a perplexity gate, not trivially pass it with a
    // 0.0 mean log-prob
    val oov = Seq((900001L, "Ω≠∑ Ω≠∑ Ω≠∑"),
      (900002L, "慶應義塾 ᚠᚢᚦᚨ ʘʘʘ")).toDF("doc_id", "text")
    val scored = Unigram.scoreDocs(oov, "doc_id", "text", pieces)
      .withColumn("mean_lp",
        col("score_micro").cast("double") / col("n_tokens") / 1e6)
      .collect()
    val minPiece = pieces.map(_._2).min
    scored.foreach { r =>
      val lp = r.getAs[Double]("mean_lp")
      assert(lp <= minPiece - 10.0 + 1e-9,
        s"OOV doc must score below every real piece, got $lp")
    }
    // and below the WORST in-vocab document from the real corpus
    val worstReal = Unigram.scoreDocs(docs, "doc_id", "text", pieces)
      .agg(min(col("score_micro").cast("double") / col("n_tokens") / 1e6))
      .head().getDouble(0)
    assert(scored.forall(_.getAs[Double]("mean_lp") < worstReal))
  }

  private def t(name: String) =
    graft.engine.Tables(spark, "/root/testdata/sf0.001", name)
}
