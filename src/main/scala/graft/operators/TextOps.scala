package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language ID, fingerprinting, corpus word counts.
  * Everything is a Catalyst expression pipeline (split / filter /
  * aggregate higher-order functions) — no UDFs, no driver-side loops.
  */
object TextOps {

  /** Words = non-empty segments after splitting on single spaces (the
    * documents table is space-separated by construction).
    */
  def words(textCol: Column): Column =
    filter(split(textCol, " "), w => w =!= "")

  /** Tokens under a BPE-ish lowercase alphanumeric regex. */
  def regexTokens(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z0-9]+"), t => t =!= "")

  /** Fixed-size token-window chunking with overlap — the RAG/embedding
    * ingestion shape (LangChain/LlamaIndex's token splitter): each
    * document becomes ⌈n/(maxTokens−overlap)⌉ windows of at most
    * `maxTokens` whitespace tokens, consecutive windows sharing
    * `overlap` tokens so no phrase is cut without context on either
    * side. Chunk text is the tokens re-joined with single spaces (the
    * canonical form — exact, replayable cross-engine).
    *
    * Plan shape for 100 TB: one narrow codegen projection per row
    * (split / sequence / posexplode / slice / array_join — no UDF, no
    * shuffle at all); output partitioning inherits the scan, and the
    * per-doc fan-out is bounded by n/step.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && maxTokens > overlap,
      "need maxTokens > overlap >= 0")
    val step = maxTokens - overlap
    docs.select(col(idCol),
        filter(split(col(textCol), "\\s+"), t => t =!= "").as("__ts"))
      .withColumn("__n", size(col("__ts")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__ts"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(step)))
          .as(Seq("chunk_idx", "start_tok")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(maxTokens), col("__n") - col("start_tok"))
          .cast("long").as("n_tok"),
        array_join(slice(col("__ts"), col("start_tok") + 1,
          lit(maxTokens)), " ").as("chunk_text"))
  }

  /** BM25 ranked retrieval over the corpus for a fixed bag of query
    * terms (Robertson/Okapi, Lucene-style idf) — the quality-retrieval
    * primitive a training-data pipeline uses to mine topical documents.
    *
    * Plan shape for 100 TB: the token explode is filtered to the QUERY
    * terms before any shuffle, so the tf table carries at most
    * |terms| rows per matching doc — the corpus is never shuffled by
    * token. Document lengths are one map-side-combinable groupBy,
    * broadcast-semi-pruned to the matching ids before the per-doc join
    * (the full (id, dl) relation never shuffles);
    * corpus-level scalars (N, avgdl) stay in the plan as a broadcast
    * one-row cross join (no driver collect); per-term df is a broadcast
    * of |terms| rows. Output is the rounded-score top-N with a
    * deterministic doc-id tiebreak, via TakeOrderedAndProject.
    */
  def bm25Search(docs0: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], topN: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val toks = docs.select(col(idCol).as("id"),
      explode(words(col(textCol))).as("w"))
    val dl = toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    val tf = toks.filter(col("w").isin(terms: _*))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // stats (N, avgdl) are corpus-wide and already computed above; for
    // the per-doc join, prune dl to the query-matching ids FIRST — at
    // 10^10 docs the full (id, dl) relation must not shuffle to serve a
    // join that only touches |matching docs| rows.
    val dlPruned = dl.join(broadcast(tf.select(col("id")).distinct()),
      Seq("id"), "left_semi")
    tf.join(broadcast(docFreq), "w")
      .join(dlPruned, "id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id"))
      .agg(round(sum(col("contrib")), 4).as("score"))
      .select(col("id").as(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topN)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists:
    * rrf(id) = Σ_lists 1/(c + rank). Each input must carry (`idCol`,
    * `rank`); ids absent from a list simply contribute nothing. The
    * hybrid-retrieval combiner (lexical + dense, or any mix) — rank is
    * the only thing fused, so incomparable scores never meet.
    *
    * Plan shape for 100 TB: inputs are already top-N cuts (bounded),
    * the union + groupBy touches at most N·lists rows per query set —
    * the expensive part is the upstream rankers, never the fusion.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, topN: Int,
      c: Int = 60): DataFrame = {
    val contribs = rankings.map(_.select(col(idCol),
      (lit(1.0) / (lit(c) + col("rank"))).as("contrib")))
    contribs.reduce(_ unionAll _)
      .groupBy(col(idCol))
      .agg(round(sum(col("contrib")), 4).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topN)
  }

  /** Top-k TF-IDF terms per document (tf · ln(N/df), df = number of
    * documents containing the term) — the per-document keyword signal a
    * curation pipeline uses for topic tagging and near-topic retrieval.
    *
    * Plan shape for 100 TB: tf is one map-side-combinable groupBy on
    * (doc, term); df derives from tf (already one row per doc-term) by
    * a second combinable groupBy on term — the corpus text is tokenized
    * exactly once and nothing wider than (id, term, count) ever
    * shuffles. The corpus-size scalar N rides the plan as a broadcast
    * one-row cross join (no driver collect), and the final top-k is a
    * bounded per-doc window over at most |vocab ∩ doc| rows. Ranking
    * compares the ROUNDED score (ties broken by term), so the order is
    * insensitive to last-ulp float differences between engines.
    */
  def tfidfTopTerms(docs0: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.engine.Par.widen(docs0)
    val tf = docs
      .select(col(idCol).as("id"), explode(words(col(textCol))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(docFreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n") / col("df")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("id").as(idCol), col("term"), col("tfidf"), col("rn"))
  }

  /** Unigram language-model scoring: average per-token log-probability
    * under a unigram LM trained on the corpus itself — the
    * perplexity-filter shape (CCNet/Gopher-style "drop documents the
    * LM finds surprising") with the simplest public model, trained and
    * applied in ONE plan. Output: (idCol, n_words, avg_logprob);
    * higher (closer to 0) = more typical text.
    *
    * Plan shape for 100 TB: per-doc term frequencies and corpus term
    * counts are both map-side-combinable groupBys off a single
    * tokenize pass (same shape as TF-IDF: nothing wider than
    * (id, term, count) shuffles — the raw token stream is never
    * joined); the corpus-total scalar rides the plan as a broadcast
    * one-row cross join, no driver collect. The tf-to-counts join
    * carries no hint, so AQE broadcasts the vocabulary when it fits
    * and shuffle-joins when it does not.
    */
  def unigramLogProb(docs0: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val tf = docs
      .select(col(idCol).as("id"), explode(words(col(textCol))).as("w"))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
    val counts = tf.groupBy(col("w")).agg(sum(col("tf")).as("c"))
    val tot = counts.agg(sum(col("c")).cast("double").as("tot"))
    tf.join(counts, "w")
      .crossJoin(broadcast(tot))
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_words"),
        round(sum(col("tf") * log(col("c") / col("tot"))) / sum(col("tf")), 4)
          .as("avg_logprob"))
      .select(col("id").as(idCol), col("n_words"), col("avg_logprob"))
  }

  /** Interpolated bigram language-model scoring — the perplexity-filter
    * ladder's next rung above [[unigramLogProb]] (Jelinek-Mercer
    * smoothing: p(w2|w1) = lam * c(w1 w2)/c(w1 ·) + (1-lam) * c(w2)/T).
    * Output per doc: n_bigrams and the mean bigram log-probability;
    * docs with < 2 words have no bigrams and are excluded (identically
    * in the SQL oracle).
    *
    * Plan shape for 100 TB: per-doc bigram tf, corpus bigram counts,
    * left-context totals and unigram counts are ALL map-side-combinable
    * groupBys off one tokenize pass — nothing wider than
    * (id, w1, w2, count) ever shuffles, and the raw token stream is
    * never joined. The corpus-total scalar rides the plan as a
    * broadcast one-row cross join. The tf-to-model joins carry no
    * hint: AQE broadcasts the vocabulary tables when they fit.
    */
  def bigramLogProb(docs0: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.8): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val ws = words(col(textCol))
    // adjacent pairs via zip_with over the shifted sequence — per-row
    // codegen, no posexplode of positions
    val bigrams = zip_with(slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val bg = docs.filter(size(ws) >= 2)
      .select(col(idCol).as("id"), explode(bigrams).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val tf2 = bg.groupBy(col("id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val c2 = tf2.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val uni = docs
      .select(explode(words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val tot = uni.agg(sum(col("cu")).cast("double").as("t"))
    val p = lit(lambda) * col("c2") / col("c1") +
      lit(1.0 - lambda) * col("cu") / col("t")
    tf2.join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .join(uni.withColumnRenamed("w", "w2"), Seq("w2"))
      .crossJoin(broadcast(tot))
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("tf") * log(p)) / sum(col("tf")), 4).as("avg_logprob"))
      .select(col("id").as(idCol), col("n_bigrams"), col("avg_logprob"))
  }

  /** Corpus data card: the per-language summary table a dataset release
    * ships (counts, source diversity, token mass, length distribution,
    * exact-dup rate). One row per language.
    *
    * Plan shape for 100 TB: ONE groupBy(lang) computes everything; the
    * two distinct aggregates count 128-bit md5 hashes, not raw strings,
    * so the Expand-based distinct shuffle carries 32-byte keys instead
    * of document bodies. The percentile buffers hold per-group numeric
    * arrays — the declared scale path is approx_percentile, certified
    * separately (SketchSpec), same as q50.
    */
  def dataCard(docs0: DataFrame, langCol: String, sourceCol: String,
      textCol: String, charsCol: String): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    docs.groupBy(col(langCol).as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col(sourceCol))).as("n_sources"),
        sum(nWordsCol(col(textCol))).as("total_words"),
        round(avg(nWordsCol(col(textCol))), 4).as("avg_words"),
        round(expr(s"percentile($charsCol, 0.5)"), 4).as("p50_chars"),
        round(expr(s"percentile($charsCol, 0.9)"), 4).as("p90_chars"),
        round(lit(1.0) -
          countDistinct(md5(col(textCol))).cast("double") / count(lit(1)),
          4).as("dup_rate"))
  }

  /** Deterministic logistic quality classifier: a fixed-weight logistic
    * regression over the per-row quality features (mean word length,
    * stopword ratio, punctuation ratio, log document length). The
    * weights are frozen constants — the operator models the SHAPE of a
    * learned quality filter (FastText/logreg score + threshold gate, as
    * in CCNet/RefinedWeb-style pipelines) while staying reproducible on
    * any engine. Pure per-row codegen expression work, no shuffle: at
    * 100 TB this rides the same single projection as every other
    * per-document signal.
    */
  def qualityScoreCol(t: Column): Column = {
    val ws = words(t)
    val nWords = size(ws).cast("bigint")
    val awl = aggregate(ws, lit(0.0), (acc, w) => acc + length(w)) /
      size(ws).cast("double")
    val sw = size(filter(ws, w => w.isin(stopwords.map(lit(_)): _*)))
      .cast("double") / size(ws).cast("double")
    val pr = (length(t) - length(regexp_replace(t, "[.,!?;]", "")))
      .cast("double") / length(t)
    val z = lit(-1.0) + lit(0.35) * awl + lit(2.2) * sw - lit(6.0) * pr +
      lit(0.15) * log(lit(1).cast("bigint") + nWords)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Per-document quality score + keep gate at 0.5 (see
    * [[qualityScoreCol]]). Output: idCol, score (rounded 4), keep (0/1).
    */
  def qualityScore(docs0: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val s = qualityScoreCol(col(textCol))
    docs.select(col(idCol),
      round(s, 4).as("score"),
      when(s >= 0.5, 1L).otherwise(0L).as("keep"))
  }

  /** Gopher-style rule filter (Rae et al. 2021, Appendix A — the
    * hand-written quality gate that precedes any learned filter in a
    * pre-training curation pipeline, adapted to this corpus's scale):
    * a document passes iff ALL of
    *   - `minWords <= n_words <= maxWords`
    *   - `minMeanLen <= mean word length <= maxMeanLen`
    *   - symbol fraction (chars outside `[a-z0-9 ]` after lowercasing)
    *     `<= maxSymbolFrac`
    *   - fraction of words containing an alphabetic char
    *     `>= minAlphaFrac`
    *   - at least `minStopHits` stopword occurrences.
    *
    * Output: idCol, n_words, mean_word_len, symbol_frac,
    * alpha_word_frac (fractions rounded to 4), stop_hits, pass (0/1).
    * The pass decision uses the UNROUNDED values.
    *
    * Plan shape for 100 TB: every rule is per-row codegen expression
    * work in ONE projection — no shuffle, no UDF; the filter rides the
    * scan like [[qualityScore]].
    */
  def gopherFilter(docs0: DataFrame, idCol: String, textCol: String,
      minWords: Int = 10, maxWords: Int = 80,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolFrac: Double = 0.1, minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val t = col(textCol)
    val ws = words(t)
    val nWords = size(ws).cast("bigint")
    val meanLen = aggregate(ws, lit(0.0), (acc, w) => acc + length(w)) /
      nWords.cast("double")
    val symbolFrac =
      length(regexp_replace(lower(t), "[a-z0-9 ]", ""))
        .cast("double") / length(t)
    val alphaFrac = size(filter(ws, w => w.rlike("[a-zA-Z]")))
      .cast("double") / nWords.cast("double")
    val stopHits = size(filter(ws,
      w => w.isin(stopwords.map(lit(_)): _*))).cast("bigint")
    val pass =
      nWords.between(minWords, maxWords) &&
      meanLen.between(minMeanLen, maxMeanLen) &&
      symbolFrac <= maxSymbolFrac &&
      alphaFrac >= minAlphaFrac &&
      stopHits >= minStopHits
    docs.select(col(idCol),
      nWords.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(symbolFrac, 4).as("symbol_frac"),
      round(alphaFrac, 4).as("alpha_word_frac"),
      stopHits.as("stop_hits"),
      when(pass, 1L).otherwise(0L).as("pass"))
  }

  /** Context-window chunking: split each document's word sequence into
    * windows of `size` words advancing by `stride` (overlap = size -
    * stride), the standard long-document transform ahead of
    * tokenize-and-pack. A doc with n <= size words yields one chunk;
    * otherwise ceil((n - size) / stride) + 1 chunks, the last one
    * possibly short. Pure Catalyst (sequence + posexplode + slice) —
    * one narrow pass, rows fan out by chunk count only.
    */
  def chunk(docs0: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(stride >= 1 && size >= stride, "need 1 <= stride <= size")
    val docs = graft.engine.Par.widen(docs0)
    val w = words(col(textCol))
    val n = org.apache.spark.sql.functions.size(w)
    val numChunks = when(n <= size, lit(1L))
      .otherwise(ceil((n - size).cast("double") / stride).cast("long") + 1)
    docs
      .select(col(idCol).as("id"), w.as("w"),
        posexplode(sequence(lit(0L), numChunks - 1)))
      .select(col("id").as(idCol), col("col").as("chunk_idx"),
        concat_ws(" ",
          slice(col("w"), (col("col") * stride + 1).cast("int"), lit(size)))
          .as("chunk_text"))
      .withColumn("chunk_words",
        org.apache.spark.sql.functions.size(words(col("chunk_text")))
          .cast("bigint"))
  }

  /** Positional phrase search: count occurrences of an n-word phrase
    * per document in ONE window pass — tokens get 0-based positions
    * from posexplode, and phrase word k must equal `lead(w, k)` over
    * the document's position order. No token self-joins: the corpus
    * shuffles once on the doc id for the window sort (at warehouse
    * scale, none at all if the corpus is already laid out by doc), and
    * only phrase-first-word matches survive to the aggregation.
    */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val withLeads = phrase.indices.tail.foldLeft(tok) { (d, k) =>
      d.withColumn(s"w$k", lead(col("w"), k).over(w))
    }
    val cond = phrase.indices.tail.foldLeft(col("w") === phrase.head) {
      (c, k) => c && col(s"w$k") === phrase(k)
    }
    withLeads.filter(cond)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Proximity search: documents where `termA` and `termB` occur
    * within `window` token positions of each other, with the number of
    * such (posA, posB) co-occurrences — the retrieval shape between
    * bag-of-words (q55 BM25) and exact phrases ([[phraseSearch]]):
    * "near each other, either order".
    *
    * Scale shape: one tokenize + posexplode pass; the per-term filter
    * lands BEFORE the shuffle, so only the two terms' postings (O(df)
    * rows of (id, pos)) reach the doc-keyed equi-join — the residual
    * |posA − posB| ≤ window predicate rides the join, never a BNLJ,
    * and the corpus token stream itself is never shuffled.
    */
  def proximitySearch(df: DataFrame, idCol: String, textCol: String,
      termA: String, termB: String, window: Int): DataFrame = {
    val tok = graft.engine.Par.widen(df).select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    val ta = tok.filter(col("w") === termA)
      .select(col(idCol), col("pos").as("pa"))
    val tb = tok.filter(col("w") === termB)
      .select(col(idCol), col("pos").as("pb"))
    ta.join(tb, Seq(idCol))
      .filter(abs(col("pa") - col("pb")) <= window)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_prox"))
  }

  /** Canonical text normalization for dedup keys: lowercase, collapse
    * every non-alphanumeric run to a single space, trim. Case/
    * punctuation/whitespace variants of the same content normalize to
    * one key, so exact dedup over this column catches the "trivially
    * edited duplicate" class that byte-exact dedup misses (the standard
    * first rung below MinHash on the near-dup ladder). Pure codegen
    * string ops — safe in a 100 TB projection.
    */
  def normalizeText(textCol: Column): Column =
    trim(regexp_replace(lower(textCol), "[^a-z0-9]+", " "))

  /** Corpus-level word frequency, descending. One explode + one
    * map-side-combinable groupBy.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    graft.engine.Par.widen(docs)
      .select(explode(words(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))

  private val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  // ---- Column-level feature builders ----------------------------------
  // Composable into ONE projection (the curation pipeline computes every
  // per-row signal in a single pass over the text); the per-feature
  // DataFrame operators below are thin wrappers with oracle-matched
  // output shapes.

  def nWordsCol(t: Column): Column = size(words(t)).cast("bigint")

  def avgWordLenCol(t: Column): Column =
    round(aggregate(words(t), lit(0.0), (acc, w) => acc + length(w)) /
      size(words(t)).cast("double"), 4)

  def stopwordRatioCol(t: Column): Column =
    round(size(filter(words(t), w => w.isin(stopwords.map(lit(_)): _*)))
      .cast("double") / size(words(t)).cast("double"), 4)

  /** Punct count = chars removed by stripping punctuation (identical
    * formula in the DuckDB oracle — avoids engine-specific char splits).
    */
  def punctRatioCol(t: Column): Column =
    round((length(t) - length(regexp_replace(t, "[.,!?;]", "")))
      .cast("double") / length(t), 4)

  def dupWordFracCol(t: Column): Column =
    round(lit(1.0) -
      size(array_distinct(words(t))) / size(words(t)).cast("double"), 4)

  def dupBigramFracCol(t: Column): Column = {
    val ws = words(t)
    val bigrams = zip_with(slice(ws, lit(1), greatest(size(ws) - 1, lit(0))),
      slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    round(when(size(bigrams) > 0,
        lit(1.0) - size(array_distinct(bigrams)) / size(bigrams).cast("double"))
      .otherwise(0.0), 4)
  }

  def nTokensCol(t: Column): Column = size(regexTokens(t)).cast("bigint")

  /** Heuristic language-ID prediction: marker-word hit count per
    * language, argmax (ties → lexicographically first language, zero
    * hits everywhere → "und").
    */
  def predLangCol(t: Column): Column = {
    val ws = words(t)
    val scored = langMarkers.map { case (lang, markers) =>
      struct(
        size(filter(ws, w => w.isin(markers.map(lit(_)): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax: sort (score desc, lang asc) by sorting on (-score, lang)
    val best = array_min(array(scored.map(s =>
      struct((-s.getField("score")).as("neg"), s.getField("lang").as("lang"))): _*))
    when(best.getField("neg") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Per-document quality features: word count, character count, mean
    * word length, stopword ratio, punctuation ratio. All per-row
    * expression work — fully parallel, no shuffle.
    */
  def qualityFeatures(docs0: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val t = col(textCol)
    docs.select(
      col(idCol),
      nWordsCol(t).as("n_words"),
      length(t).cast("bigint").as("nchars"),
      avgWordLenCol(t).as("avg_word_len"),
      stopwordRatioCol(t).as("stopword_ratio"),
      punctRatioCol(t).as("punct_ratio"))
  }

  /** Marker-word vocabularies for the n-gram-heuristic language ID.
    * Deliberately tiny — the point is the operator shape (per-language
    * score → argmax), not lexicographic completeness.
    */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "la", "y", "los", "de"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Heuristic language ID: score = marker-word hit count per language;
    * prediction = argmax (ties → lexicographically first language,
    * no hits at all → "und" i.e. undetermined).
    */
  def langId(docs0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    docs.select(col(idCol), predLangCol(col(textCol)).as("pred_lang"))
  }

  /** Repetition signals (Gopher/RefinedWeb-style quality rules): the
    * fraction of duplicated words and duplicated word-bigrams within a
    * document. High values flag boilerplate/spam. Pure per-row
    * expression work.
    */
  def repetitionFeatures(docs0: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val t = col(textCol)
    docs.select(
      col(idCol),
      dupWordFracCol(t).as("dup_word_frac"),
      dupBigramFracCol(t).as("dup_bigram_frac"))
  }

  /** PII-ish pattern counts per document (emails, URLs, long digit
    * runs) — the redaction-candidate signal of a curation pipeline.
    */
  def piiFeatures(docs0: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    def cnt(pattern: String): Column =
      size(regexp_extract_all(col(textCol), lit(pattern), lit(0))).cast("bigint")
    docs.select(
      col(idCol),
      cnt("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}").as("n_emails"),
      cnt("https?://[^ ]+").as("n_urls"),
      cnt("[0-9]{9,}").as("n_long_digits"))
  }

  /** PII redaction transform — [[piiFeatures]]' acting sibling: emails,
    * URLs and long digit runs replaced by typed placeholder tokens (the
    * standard pre-training scrub). Email runs first so its addresses
    * are gone before the URL pass; digit runs last so digits inside
    * redacted spans don't double-fire. Pure per-row codegen
    * (regexp_replace chain) — rides the same single projection as every
    * other per-document signal; nothing shuffles.
    */
  def redactPii(docs0: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(col(textCol),
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "https?://[^ ]+", "<URL>"),
      "[0-9]{9,}", "<NUM>")
    docs.select(col(idCol), redacted.as("redacted"),
      (length(col(textCol)) - length(redacted)).cast("bigint")
        .as("chars_removed"))
  }

  /** Content-defined fingerprints: md5 hex (exact), xxhash64 (cheap
    * exact), and a polynomial rolling hash over characters (order-
    * sensitive, oracle-reproducible: h = Σ (31^i · code_i) mod 2^31-1,
    * evaluated left-to-right as h = (h·31 + code) mod p).
    */
  def fingerprints(docs0: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val p = lit(2147483647L) // 2^31 - 1: keeps h*31+code < 2^36, no overflow
    // split(text, "") emits a trailing "" (Java split with limit -1) —
    // filter it so char enumeration matches a plain per-char walk
    val chars = filter(split(col(textCol), ""), ch => ch =!= "")
    val rolling = aggregate(
      transform(chars, ch => ascii(ch).cast("bigint")),
      lit(0L),
      (h, code) => pmod(h * 31 + code, p))
    docs.select(col(idCol),
      md5(col(textCol)).as("md5_fp"),
      xxhash64(col(textCol)).as("xx_fp"),
      rolling.as("roll_fp"))
  }

  /** URL canonicalization — the normalization every web-corpus
    * URL-dedup runs before grouping (CCNet/RefinedWeb "dedup by URL"):
    * lowercase scheme and host, strip the scheme's default port, drop
    * the fragment, remove tracking parameters (utm_*, fbclid, gclid,
    * ref), sort the surviving query parameters, and collapse one
    * trailing slash on a non-root path. Pure column expressions
    * (regex + array ops, fully codegen) — no UDF, and every rule is
    * re-expressible in the oracle's SQL dialect, so canonical
    * equality is certified cross-engine rather than assumed.
    */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path0 = regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val path = when(path0 === "", lit("/"))
      .otherwise(regexp_replace(path0, "(.+)/$", "$1"))
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)="))
    val q2 = array_join(array_sort(kept), "&")
    concat(scheme, lit("://"), host, path,
      when(q2 =!= "", concat(lit("?"), q2)).otherwise(lit("")))
  }

  /** All dot-boundary suffixes of a hostname, longest first:
    * `a.b.com` → `[a.b.com, b.com, com]`. Turning suffix matching
    * into set membership is THE scale move for blocklist filtering:
    * a host matches a blocked domain iff one of its O(label-count)
    * suffixes equals a blocklist entry, so the crawl-filter join is a
    * plain equi-join on the suffix column — hash-partitionable,
    * broadcastable when the list is small, and never a theta/LIKE
    * join (which would be |corpus|×|blocklist| at 100 TB).
    */
  def domainSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(1), size(parts)), i =>
      array_join(slice(parts, i, size(parts) - i + 1), "."))
  }

  /** Blocklist verdict per document: explode the suffix chain,
    * equi-join the blocklist (left), and report the matched rule —
    * NULL ⇒ kept. A host matching several rules reports the most
    * specific (longest) one. The rules side is broadcast — real
    * blocklists (even the million-entry public ones) are megabytes;
    * if a list ever outgrew the broadcast threshold, dropping the
    * hint leaves a plain shuffled equi-join on the suffix, still
    * never a theta join.
    */
  def blocklistMatch(docs: DataFrame, idCol: String, hostCol: String,
      rules: DataFrame, ruleCol: String): DataFrame = {
    val suffixed = docs.select(col(idCol), col(hostCol),
        posexplode(domainSuffixes(col(hostCol))).as(Seq("pos", "suffix")))
    val hits = suffixed
      .join(broadcast(rules.select(col(ruleCol).as("suffix"))), Seq("suffix"))
      .groupBy(col(idCol))
      .agg(min_by(col("suffix"), col("pos")).as("matched_rule"))
    docs.select(col(idCol), col(hostCol))
      .join(hits, Seq(idCol), "left")
  }

  /** Parse robots.txt bodies into per-host (allow, prefix) rules for
    * the `*` user-agent — the REP (RFC 9309) subset a crawl pipeline
    * enforces before a URL ever reaches the fetcher. Grammar handled:
    * `#` comments, blank lines, case-insensitive keys, groups formed
    * by RUNS of consecutive `User-agent` lines (a group applies iff
    * one of its agents is `*`), `Allow`/`Disallow` path prefixes,
    * empty `Disallow:` ignored (allow-all idiom). Pure column ops:
    * one posexplode over lines + two windows per host — rules stay
    * |hosts|·|lines|, never touching the URL corpus.
    */
  def parseRobots(robots: DataFrame, hostCol: String,
      bodyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("pos", "raw")))
      .select(col("host"), col("pos"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .select(col("host"), col("pos"),
        lower(trim(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)))
          .as("key"),
        trim(regexp_extract(col("line"), ":\\s*(.*)$", 1)).as("value"))
    val w = Window.partitionBy("host").orderBy("pos")
    val grouped = lines
      .withColumn("ua", (col("key") === "user-agent").cast("int"))
      .withColumn("grp_start",
        (col("ua") === 1 &&
          coalesce(lag(col("ua"), 1).over(w), lit(0)) === 0).cast("long"))
      .withColumn("grp", sum(col("grp_start")).over(w))
    val starGroups = grouped
      .filter(col("ua") === 1 && col("value") === "*")
      .select(col("host"), col("grp")).distinct()
    grouped
      .filter(col("key").isin("allow", "disallow") && col("value") =!= "")
      .join(starGroups, Seq("host", "grp"), "left_semi")
      .select(col("host"), (col("key") === "allow").as("allow"),
        col("value").as("prefix"))
  }

  /** REP verdict per URL: equi-join rules on host, keep rules whose
    * prefix matches, take the longest match (tie → allow); no rule ⇒
    * allowed. Work is |urls|·|rules-per-host| after the host join —
    * the rule set is per-host-bounded, so this scales as a plain
    * hash join at any corpus size.
    */
  def robotsVerdict(urls: DataFrame, idCol: String, hostCol: String,
      pathCol: String, rules: DataFrame): DataFrame = {
    val matched = urls.select(col(idCol), col(hostCol).as("host"),
        col(pathCol).as("path"))
      .join(rules.withColumnRenamed("host", "host"), Seq("host"), "left")
      .withColumn("hit",
        col("prefix").isNotNull && col("path").startsWith(col("prefix")))
      .groupBy(col(idCol))
      .agg(max(when(col("hit"),
          struct(length(col("prefix")).as("l"),
            col("allow").cast("int").as("a"))))
        .as("best"))
    urls.select(col(idCol), col(hostCol), col(pathCol))
      .join(matched, Seq(idCol), "left")
      .withColumn("allowed",
        coalesce(col("best.a") === 1, lit(true)))
      .drop("best")
  }

  /** HTML → text extraction — the boilerplate-strip pass a web-corpus
    * pipeline runs on every crawled page before any text analysis
    * (the trafilatura/jusText role, reduced to its deterministic
    * core): drop script/style blocks and comments, turn block-closing
    * tags into newlines, strip remaining tags, decode the six
    * ubiquitous entities (&amp; last, so `&amp;lt;` decodes once),
    * collapse horizontal whitespace, and normalize blank runs around
    * newlines. A pure regexp_replace chain — fully codegen, one
    * narrow pass over the page bytes, no shuffle — and every pattern
    * is RE2-compatible (no backreferences), so the oracle replays the
    * identical chain in DuckDB and certifies the extraction
    * cross-engine.
    */
  def htmlToText(h: Column): Column = {
    val noScript = regexp_replace(h, "(?is)<script\\b[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", "")
    val breaks = regexp_replace(noComment,
      "(?i)<(?:br|/p|/div|/h[1-6]|/li|/tr|/table|/ul|/ol)[^>]*>", "\n")
    val noTags = regexp_replace(breaks, "<[^>]*>", " ")
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    val sp = regexp_replace(ent, "[ \\t]+", " ")
    val nl = regexp_replace(sp, "\\s*\\n\\s*", "\n")
    regexp_replace(nl, "^\\s+|\\s+$", "")
  }

  /** Outbound links of an HTML page as an array of href values —
    * the web-graph extraction a crawl pipeline runs to build the
    * host-level link graph (quality/centrality signals feed curation).
    * Same single-narrow-pass / RE2-compatible discipline as
    * [[htmlToText]].
    */
  def htmlLinks(h: Column): Column =
    regexp_extract_all(h, lit("(?is)<a\\s[^>]*href=\"([^\"]+)\""), lit(1))

  /** HTML table extraction — the "table to relation" step a data
    * pipeline runs to recover structured rows from crawled pages:
    * `<tr>` blocks, then `<td>/<th>` cells within each, as arrays the
    * caller posexplodes into (row_idx, col_idx, cell) tuples. RE2-
    * compatible non-greedy patterns, so the oracle replays them.
    */
  def htmlTableRows(h: Column): Column =
    regexp_extract_all(h, lit("(?is)<tr[^>]*>(.*?)</tr>"), lit(1))

  def htmlRowCells(row: Column): Column =
    regexp_extract_all(row, lit("(?is)<t[dh][^>]*>(.*?)</t[dh]>"), lit(1))

  /** Cell cleanup: strip inline tags, decode the six entities
    * ([[htmlToText]] order — &amp; last), collapse spaces, trim.
    */
  def cellText(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", "")
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (x, (e, r)) => regexp_replace(x, e, r) }
    regexp_replace(regexp_replace(ent, "[ \\t]+", " "), "^\\s+|\\s+$", "")
  }

  /** Unicode-script character counts — the script-detection signal a
    * multilingual pipeline uses to route documents to per-script
    * tokenizers and to catch mixed-script spam (Latin text stuffed
    * with Cyrillic lookalikes). Counting is length-after-removing-
    * non-members, one codegen pass; the `\x{…}` class syntax is
    * shared by Java regex and RE2, so the oracle counts the same
    * ranges.
    */
  def scriptCount(t: Column, cls: String): Column =
    length(regexp_replace(t, s"[^$cls]", "")).cast("bigint")

  /** Dominant script label from the four counted ranges (ties broken
    * by the fixed priority latin > cyrillic > greek > cjk, so the
    * label is a pure function of the counts).
    */
  def dominantScript(latin: Column, cyr: Column, greek: Column,
      cjk: Column): Column =
    when(latin >= cyr && latin >= greek && latin >= cjk, "latin")
      .when(cyr >= greek && cyr >= cjk, "cyrillic")
      .when(greek >= cjk, "greek")
      .otherwise("cjk")

  /** Distributed JSON schema profiling — the infer-schema step a
    * semi-structured ingest runs before declaring columns: for every
    * top-level key across a JSON column, how often it is present and
    * with what value types. One narrow pass (`json_object_keys` →
    * explode → per-key extract + classify), one map-side-combinable
    * groupBy over (key) — the document bodies never shuffle, only
    * (key, type-flag) pairs do. Type classification is lexical over
    * the extracted text (integer / boolean literal / everything else
    * a string), which is exact for JSON whose string values are not
    * digit-only — the caller's contract, and what makes the profile
    * engine-independent. Two further clauses of that contract (from
    * the map<string,string> parse): top-level keys must not repeat
    * within one document (the map keeps the LAST occurrence where the
    * per-key extract counted each and took the first), and NESTED
    * values are re-serialized by Jackson rather than extracted
    * verbatim — documents violating either can shift n_present /
    * type counts.
    *
    * Output: (key, n_present, n_int, n_bool, n_str, presence_ppm)
    * with presence in exact ppm of the row count.
    */
  def jsonProfile(df: DataFrame, jsonCol: String): DataFrame = {
    val total = df.agg(count(lit(1)).as("n_total"))
    // ONE JSON parse per row: explode the object as a string→string
    // map (Jackson renders scalar values as their raw text, exactly
    // what `get_json_object('$.key')` returned). The previous shape —
    // `json_object_keys` + one `get_json_object` per exploded key —
    // re-parsed the full document k+1 times per row; a profiler's
    // whole input is JSON, so the parse IS the operator's hot loop.
    val kv = df.select(col(jsonCol).as("j"))
      .select(explode(expr("from_json(j, 'map<string,string>')"))
        .as(Seq("key", "v")))
      .withColumn("cls",
        when(col("v").rlike("^-?[0-9]+$"), "int")
          .when(col("v").isin("true", "false"), "bool")
          .otherwise("str"))
    kv.groupBy(col("key"))
      .agg(count(lit(1)).as("n_present"),
        sum(when(col("cls") === "int", 1L).otherwise(0L)).as("n_int"),
        sum(when(col("cls") === "bool", 1L).otherwise(0L)).as("n_bool"),
        sum(when(col("cls") === "str", 1L).otherwise(0L)).as("n_str"))
      .crossJoin(broadcast(total))
      .withColumn("presence_ppm",
        expr("n_present * 1000000 div n_total"))
      .drop("n_total")
  }
}
