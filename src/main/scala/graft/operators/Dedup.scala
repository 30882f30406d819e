package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data
  * pipelines. All of them are shuffle-planned (inverted-index or
  * LSH-bucket joins) — never an O(n²) cross join — so they scale to a
  * corpus that doesn't fit one executor.
  *
  * Variants:
  *   - [[exact]]: hash-groupBy on the full text (one shuffle).
  *   - [[jaccardPairs]]: exact n-gram Jaccard via inverted-index
  *     self-join (shuffle on token, then on pair).
  *   - [[minHashPairs]]: MinHash signatures + banded LSH bucket join —
  *     the scale path: candidate generation touches only colliding
  *     bands, never all pairs.
  *   - [[simHash]]: 64-bit SimHash fingerprint per document; near-dups
  *     have small Hamming distance.
  */
object Dedup {

  /** Exact dedup: keep the lowest id per identical `textCol`.
    * One hash-aggregate shuffle on the text hash. At 100 TB you'd
    * pre-hash to a 128-bit key (xxhash64 + length) to avoid shuffling
    * full document bodies; we group by (hash, text) so the shuffle key
    * is the 8-byte hash prefix while correctness still compares text.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(xxhash64(col(textCol)).as("_h"), col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop("_h", textCol)

  /** Blocked edit-distance near-dup pairs — the fuzzy-dedup rung
    * between byte-exact and shingle-Jaccard: pairs whose Levenshtein
    * distance is at most `maxDistFrac` of the longer text.
    *
    * Blocking (the 100 TB-critical part): OR-blocking on TWO
    * two-token signatures per doc within a `blockChars` length bucket —
    * (first two tokens) and (last two tokens). A candidate survives if
    * it shares EITHER signature, so a near-dup pair is missed only when
    * the edit touches both the prefix and the suffix (pigeonhole-style
    * recall, same trick as the SimHash band blocking in
    * [[simhashPairs]]). Two-token signatures break the Zipfian
    * single-first-word hot block ("the ..." holding a constant corpus
    * fraction) that made single-key blocking revert toward all-pairs on
    * natural text; the residual hot signatures ("of the ...") are
    * bounded by `maxBlock`: any block larger than that is EXCLUDED
    * from its axis (the other signature may still pair its members) —
    * a hard ceiling of maxBlock² on any block's pair count. Dropped
    * blocks are observable via [[fuzzyOverflowBlocks]]; at real scale
    * run edit-distance dedup after a coarse pass (exact/minhash) has
    * thinned the corpus, and treat overflow counts as the signal that
    * the cap is biting.
    *
    * Kernel: the self-joins shuffle on (length bucket, signature)
    * only; Levenshtein runs only on in-block pairs, BANDED to each
    * pair's OWN distance budget ceil(maxDistFrac * max(len_a, len_b))
    * — Spark's thresholded levenshtein (the third argument is a
    * per-row expression, not a constant) costs O(len * K_pair) per
    * pair instead of O(len^2), the band by construction never cuts a
    * true match, and no corpus-wide max-length pre-scan is needed
    * (the global-K variant cost one extra full-corpus driver action
    * per call).
    */
  def fuzzyPairs(docs0: DataFrame, idCol: String, textCol: String,
      maxDistFrac: Double, blockChars: Int = 40,
      maxBlock: Int = 5000): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val sized = fuzzyBlocked(docs, idCol, textCol, blockChars)
    def arm(k: String, c: String) = {
      val x = sized.filter(col(c) <= maxBlock)
        .select(col("id").as("a"), col("t").as("ta"), col("lb"), col(k))
      val y = sized.filter(col(c) <= maxBlock)
        .select(col("id").as("b"), col("t").as("tb"), col("lb"), col(k))
      x.join(y, Seq("lb", k)).filter(col("a") < col("b"))
        .select(col("a"), col("b"), col("ta"), col("tb"))
    }
    // distinct de-dups pairs caught by both signatures; ta/tb are
    // functionally determined by (a, b) so the pair key suffices
    val cand = arm("k1", "c1").unionAll(arm("k2", "c2"))
      .groupBy("a", "b")
      .agg(first(col("ta")).as("ta"), first(col("tb")).as("tb"))
    cand
      // Levenshtein >= |length difference|: pairs already past the
      // budget on length alone skip the kernel entirely
      .filter(abs(length(col("ta")) - length(col("tb"))) <=
        lit(maxDistFrac) * greatest(length(col("ta")), length(col("tb"))))
      // per-pair band: ceil of the pair's own budget (>= 1 so empty
      // strings still evaluate); thresholded kernel returns -1 above
      // the band — never a valid d
      .withColumn("band", greatest(
        ceil(lit(maxDistFrac) *
          greatest(length(col("ta")), length(col("tb")))), lit(1))
        .cast("int"))
      .withColumn("d", expr("levenshtein(ta, tb, band)").cast("bigint"))
      .filter(col("d") >= 0 && col("d") <=
        lit(maxDistFrac) * greatest(length(col("ta")), length(col("tb"))))
      .select(col("a"), col("b"), col("d"))
  }

  /** Docs keyed for fuzzy blocking: length bucket `lb`, prefix/suffix
    * two-token signatures `k1`/`k2`, and each signature's block size
    * `c1`/`c2` (window counts — the shuffle is on the same key the
    * join needs anyway).
    */
  private def fuzzyBlocked(docs: DataFrame, idCol: String,
      textCol: String, blockChars: Int): DataFrame = {
    val ws = split(col(textCol), " ")
    def tok(i: Int) = coalesce(try_element_at(ws, lit(i)), lit(""))
    val keyed = docs.select(
      col(idCol).as("id"), col(textCol).as("t"),
      floor(length(col(textCol)) / blockChars).as("lb"),
      concat(tok(1), lit(" "), tok(2)).as("k1"),
      concat(tok(-2), lit(" "), tok(-1)).as("k2"))
    keyed
      .withColumn("c1", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lb"), col("k1"))))
      .withColumn("c2", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lb"), col("k2"))))
  }

  /** Blocks [[fuzzyPairs]] dropped under its `maxBlock` cap:
    * (axis, lb, signature, size). Empty means the cap never bit — the
    * scale-health check a pipeline should alert on.
    */
  def fuzzyOverflowBlocks(docs0: DataFrame, idCol: String,
      textCol: String, blockChars: Int = 40,
      maxBlock: Int = 5000): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val sized = fuzzyBlocked(docs, idCol, textCol, blockChars)
    val o1 = sized.filter(col("c1") > maxBlock)
      .select(lit("k1").as("axis"), col("lb"),
        col("k1").as("signature"), col("c1").as("block_size"))
    val o2 = sized.filter(col("c2") > maxBlock)
      .select(lit("k2").as("axis"), col("lb"),
        col("k2").as("signature"), col("c2").as("block_size"))
    o1.unionAll(o2).distinct()
  }

  /** Distinct word-level shingles per doc: (id, shingle). `n = 1` gives
    * unigram token sets; `n >= 2` gives word n-grams (sliding window).
    */
  def shingles(docs0: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val words = filter(split(col(textCol), " "), w => w =!= "")
    val sh =
      if (n == 1) words
      else {
        // sliding word n-grams via transform over start positions;
        // docs with fewer than n words yield an empty shingle set
        val grams = transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", slice(words, i + 1, lit(n))))
        when(size(words) >= n, grams)
          .otherwise(array().cast("array<string>"))
      }
    docs.select(col(idCol).as("id"),
      explode(array_distinct(sh)).as("shingle"))
  }

  /** Exact n-gram Jaccard similarity for all pairs with sim >= threshold.
    *
    * Plan shape: inverted index (shuffle on shingle) → pair counting
    * (shuffle on (a,b)) → join against per-doc sizes (broadcastable when
    * the doc-id/size table is small relative to pairs). No cross join.
    * For skewed shingles (stopword-like), `maxDocFreq` drops shingles
    * occurring in more than that many docs — a standard posting-list cut
    * that bounds the worst-case pair blowup. The cut removes ubiquitous
    * shingles from the ENTIRE similarity space (intersections AND doc
    * sizes), so identical documents still score jac = 1.0 and the
    * measure stays a true Jaccard over the filtered shingle sets.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDocFreq: Long = Long.MaxValue): DataFrame = {
    // hash IMMEDIATELY: every downstream shuffle (df counting, the
    // posting cut join, pair counting) moves 8-byte shingle hashes, not
    // shingle strings (64-bit collisions are ~p=1e-8 at 1M distinct
    // shingles — negligible against the join-width saving at scale).
    // cached: consumed 3x (df + posting join + sizes).
    val hashed = shingles(docs, idCol, textCol, n)
      .select(col("id"), xxhash64(col("shingle")).as("sh")).cache()
    // the cut is an ANTI-join against the HOT set (df > maxDocFreq):
    // hot shingles are few by definition (stopword-like), so the join's
    // build side stays small at any corpus scale — the inner-join
    // formulation against the non-hot set would build over essentially
    // every distinct shingle
    val posting =
      if (maxDocFreq == Long.MaxValue) hashed
      else {
        val hot = hashed.groupBy(col("sh")).agg(count(lit(1)).as("_df"))
          .filter(col("_df") > maxDocFreq).select(col("sh"))
        hashed.join(hot, Seq("sh"), "left_anti")
      }
    val sizes = posting.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val a = posting.select(col("id").as("a"), col("sh"))
    val b = posting.select(col("id").as("b"), col("sh"))
    val inter = a.join(b, Seq("sh"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), Seq("b"))
      .withColumn("jac",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jac"))
  }

  /** Exact n-gram CONTAINMENT pairs: cont = |A∩B| / min(|A|,|B|) ≥ t.
    * Containment is the asymmetric cousin of Jaccard and the right
    * measure for quote/subset duplication — a paragraph fully embedded
    * in a larger page scores cont ≈ 1.0 while its symmetric Jaccard
    * (÷ union) can sit far below any dedup threshold. LLM curation
    * pipelines use exactly this to catch boilerplate-wrapped copies
    * (the SlimPajama/RefinedWeb-style "low-length-ratio duplicate"
    * case) that [[jaccardPairs]] structurally misses.
    *
    * Same inverted-index plan shape as [[jaccardPairs]] (8-byte shingle
    * hashes through every shuffle, anti-join posting cut against the
    * hot set, pair counting partial-aggregated map-side); only the
    * final score divides by the SMALLER set.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val hashed = shingles(docs, idCol, textCol, n)
      .select(col("id"), xxhash64(col("shingle")).as("sh")).cache()
    val posting =
      if (maxDocFreq == Long.MaxValue) hashed
      else {
        val hot = hashed.groupBy(col("sh")).agg(count(lit(1)).as("_df"))
          .filter(col("_df") > maxDocFreq).select(col("sh"))
        hashed.join(hot, Seq("sh"), "left_anti")
      }
    val sizes = posting.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val a = posting.select(col("id").as("a"), col("sh"))
    val b = posting.select(col("id").as("b"), col("sh"))
    val inter = a.join(b, Seq("sh"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), Seq("b"))
      .withColumn("cont",
        col("inter").cast("double") / least(col("sza"), col("szb")))
      .filter(col("cont") >= threshold)
      .select(col("a"), col("b"), round(col("cont"), 4).as("cont"))
  }

  /** Exact Jaccard with PREFIX FILTERING (PPJoin-style): for threshold
    * t, any pair with jac >= t must share a shingle within each side's
    * first `|d| - ceil(t*|d|) + 1` shingles under a global total order
    * (rarest first). Candidates come from an inverted index over
    * prefixes only, pruned further by PPJoin's LENGTH and POSITIONAL
    * filters (both lossless — see below), then exact merge-intersects
    * verify each candidate. Same output as [[jaccardPairs]], far less
    * join volume at high thresholds.
    *
    * Density crossover, measured at 20× sf0.1 (100k docs, ~1M true
    * pairs): at t >= ~0.7 the prefix is short and candidates stay near
    * the true pairs — this path wins. At t = 0.5 on a duplication-heavy
    * corpus the prefix is half of every document and candidates explode
    * two orders of magnitude past the true pairs; there the inverted-
    * index [[jaccardPairs]] (whose pair-counting shuffle partial-
    * aggregates map-side) is the right plan. Pick by threshold.
    */
  /** @param rarityOrder order shingles rarest-first (global df) before
    *        taking prefixes — costs a df join + per-doc window but
    *        minimizes candidates; the right default at corpus scale.
    *        `false` uses the hash order straight off the packed array
    *        (no df pass — cheaper on small/low-skew corpora).
    */
  def jaccardPairsPrefix(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, rarityOrder: Boolean = true): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    import org.apache.spark.sql.expressions.Window
    val sh = shingles(docs, idCol, textCol, n)
      .select(col("id"), xxhash64(col("shingle")).as("sh")).cache()

    // one row per doc: sorted shingle-hash array (for merge-intersect
    // verification) + size
    val docArrays = sh.groupBy(col("id"))
      .agg(sort_array(collect_list(col("sh"))).as("shs"),
        count(lit(1)).as("sz")).cache()

    // any global total order satisfies the prefix-filter guarantee;
    // prefix rows carry (pos, sz) for the positional filter below
    val prefixLen = (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")
    val prefix =
      if (rarityOrder) {
        val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("_df"))
        val byRarity = Window.partitionBy(col("id"))
          .orderBy(col("_df").asc, col("sh").asc)
        sh.join(df, "sh")
          .withColumn("pos", row_number().over(byRarity))
          .join(docArrays.select(col("id"), col("sz")), "id")
          .filter(col("pos") <= col("sz") - ceil(col("sz") * threshold) + 1)
          .select(col("id"), col("sh"), col("pos"), col("sz"))
      } else docArrays
        .select(col("id"), col("sz"),
          posexplode(slice(col("shs"), lit(1), prefixLen)))
        .select(col("id"), col("col").as("sh"),
          (col("pos") + 1).as("pos"), col("sz"))

    // PPJoin pruning, applied per joined row BEFORE the distinct
    // shuffle. Both filters are lossless:
    //   - length: jac >= t forces t*|a| <= |b| <= |a|/t;
    //   - positional: jac >= t forces overlap >= ceil(t/(1+t)*(|a|+|b|))
    //     = alpha, and every shared element sits at-or-after the pair's
    //     FIRST shared element in the global order, so that first match
    //     (positions i, j) satisfies alpha <= 1 + min(|a|-i, |b|-j).
    //     Rows violating the bound can be dropped: a qualifying pair
    //     always survives via its earliest-match row.
    val alpha = ceil(lit(threshold) / (1 + threshold) *
      (col("sza") + col("szb")))
    val candidates = prefix
      .select(col("id").as("a"), col("sh"), col("pos").as("pa"), col("sz").as("sza"))
      .join(prefix
        .select(col("id").as("b"), col("sh"), col("pos").as("pb"), col("sz").as("szb")),
        Seq("sh"))
      .filter(col("a") < col("b"))
      .filter(col("szb") >= ceil(col("sza") * threshold) &&
        col("sza") >= ceil(col("szb") * threshold))
      .filter(lit(1) + least(col("sza") - col("pa"), col("szb") - col("pb")) >= alpha)
      .select("a", "b").distinct()

    // exact verification: one codegen merge-intersect per candidate
    // pair over the packed sorted arrays — no expand-join, no groupBy
    val inter = column(graft.functions.SortedLongIntersect(
      expression(col("shsa")), expression(col("shsb"))))
    candidates
      .join(docArrays.select(col("id").as("a"), col("shs").as("shsa"),
        col("sz").as("sza")), Seq("a"))
      .join(docArrays.select(col("id").as("b"), col("shs").as("shsb"),
        col("sz").as("szb")), Seq("b"))
      .withColumn("inter", inter)
      .withColumn("jac",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("a"), col("b"), round(col("jac"), 4).as("jac"))
  }

  /** Threshold-driven plan selection between the two exact-Jaccard
    * implementations (both produce the identical (a, b, jac) relation):
    *
    *   - t >= `crossover`: [[jaccardPairsPrefix]] — the prefix is a
    *     small slice of each doc, candidates stay near the true pairs,
    *     and the codegen merge-intersect verify wins (measured 9.9 s vs
    *     65 s at 20× sf0.1, t = 0.8).
    *   - t < `crossover`: [[jaccardPairs]] — at low thresholds the
    *     prefix covers most of every doc and candidate pairs explode
    *     ~two orders of magnitude past the true pairs; the inverted
    *     index with map-side partial pair counting is the right plan
    *     (65 s → 6 s at 20×, t = 0.5).
    *
    * The 0.7 default crossover is the measured break-even on a
    * duplication-heavy corpus; it is a plan choice only — results are
    * identical either side (DedupSpec pins the equality).
    * `maxDocFreq` (posting-list cut, which changes the similarity
    * space) only applies on the inverted-index branch; requesting a cut
    * above the crossover is rejected rather than silently ignored.
    */
  def jaccardAuto(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDocFreq: Long = Long.MaxValue,
      crossover: Double = 0.7): DataFrame =
    if (threshold >= crossover) {
      require(maxDocFreq == Long.MaxValue,
        "posting-list cut is only implemented on the inverted-index plan " +
          s"(threshold < $crossover)")
      jaccardPairsPrefix(docs, idCol, textCol, n, threshold)
    } else jaccardPairs(docs, idCol, textCol, n, threshold, maxDocFreq)

  /** Eval-set decontamination (GPT-3-style n-gram overlap filtering):
    * annotate every training document with the fraction of its n-gram
    * shingles that appear ANYWHERE in the eval corpus, and keep docs
    * under `maxOverlapFrac`.
    *
    * Plan shape: the eval n-gram set is tiny relative to the training
    * corpus (benchmarks are small by definition) — it is distinct'd to
    * 8-byte hashes and BROADCAST, so the training side is one narrow
    * pass (shingle explode -> broadcast semi-match -> per-doc count);
    * the training corpus is never shuffled by shingle.
    *
    * Returns the training rows + (`overlap_frac`, `contaminated`);
    * docs too short to shingle count as clean (overlap 0).
    */
  def decontaminate(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int,
      maxOverlapFrac: Double): DataFrame = {
    val evalGrams = shingles(eval, idCol, textCol, n)
      .select(xxhash64(col("shingle")).as("sh")).distinct()
    val trainSh = shingles(train, idCol, textCol, n)
      .select(col("id"), xxhash64(col("shingle")).as("sh"))
    val stats = trainSh
      .join(broadcast(evalGrams).withColumn("_hit", lit(1)), Seq("sh"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("_sz"), sum(col("_hit")).as("_hits"))
      .select(col("id").as(idCol),
        round(coalesce(col("_hits"), lit(0)).cast("double") / col("_sz"), 4)
          .as("overlap_frac"))
    train.join(stats, Seq(idCol), "left")
      .withColumn("overlap_frac", coalesce(col("overlap_frac"), lit(0.0)))
      .withColumn("contaminated", col("overlap_frac") >= maxOverlapFrac)
  }

  /** [[decontaminate]] at HUGE eval-set scale: a Bloom-filter prefilter
    * in front of the exact check. The broadcast-hash-set plan breaks
    * when the eval corpus has ~10^9 distinct n-grams (an 8 GB
    * broadcast); here the eval grams aggregate into a Spark Bloom
    * filter (Catalyst `BloomFilterAggregate` — partial-aggregatable,
    * distributed build), whose few-MB binary rides the probe side as a
    * plan literal inside codegen (`BloomFilterMightContain`). Training
    * docs with NO bloom hit — the overwhelming majority — are decided
    * at scan speed with zero shuffle; only flagged candidates' shingles
    * enter the exact join, which carries no broadcast hint so AQE picks
    * shuffle vs broadcast by the (now tiny) candidate volume.
    *
    * Bloom false positives cost only wasted verification; false
    * negatives are impossible — so the output is IDENTICAL to
    * [[decontaminate]], row for row, and shares its SQL oracle.
    */
  def decontaminateBloom(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int, maxOverlapFrac: Double,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType

    val evalGrams = shingles(eval, idCol, textCol, n)
      .select(xxhash64(col("shingle")).as("sh")).distinct()
    // size the filter from the (small-side) distinct-gram count; cap at
    // Spark's default aggregate limits (4M items / 64Mbit = 8 MB)
    val est = math.min(4000000L, math.max(1L, evalGrams.count()))
    val bits = math.min(67108864L,
      math.max(64L, math.ceil(-est * math.log(fpp) / (math.log(2) * math.log(2))).toLong))
    val bloomRow = evalGrams
      .agg(column(new BloomFilterAggregate(expression(col("sh")),
        Literal(est), Literal(bits)).toAggregateExpression()).as("bf"))
      .head()
    val bloom = if (bloomRow.isNullAt(0)) null else bloomRow.getAs[Array[Byte]](0)

    val trainSh = shingles(train, idCol, textCol, n)
      .select(col("id"), xxhash64(col("shingle")).as("sh"))
    val candIds =
      if (bloom == null) trainSh.select(col("id")).filter(lit(false))
      else trainSh
        .filter(column(BloomFilterMightContain(Literal(bloom, BinaryType),
          expression(col("sh")))))
        .select(col("id")).distinct()
    // exact verify, candidates only; NO broadcast hint — AQE decides
    val stats = trainSh.join(candIds, Seq("id"), "left_semi")
      .join(evalGrams.withColumn("_hit", lit(1)), Seq("sh"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("_sz"), sum(col("_hit")).as("_hits"))
      .select(col("id").as(idCol),
        round(coalesce(col("_hits"), lit(0)).cast("double") / col("_sz"), 4)
          .as("overlap_frac"))
    train.join(stats, Seq(idCol), "left")
      .withColumn("overlap_frac", coalesce(col("overlap_frac"), lit(0.0)))
      .withColumn("contaminated", col("overlap_frac") >= maxOverlapFrac)
  }

  /** Deterministic 64-bit non-cryptographic hash of a shingle, built from
    * xxhash64 with a per-function salt — the standard MinHash family
    * h_i(x) = xxhash64(i, x).
    */
  /** Substring-level duplication stats (the signal behind exact
    * substring dedup à la "Deduplicating Training Data Makes Language
    * Models Better", Lee et al. 2022, reference approach — not code):
    * every word `n`-gram OCCURRENCE (with position, not distinct) is a
    * span; a span is duplicated when its n-gram occurs in at least two
    * distinct documents. Output per document: total spans, duplicated
    * spans, duplicated fraction — the "how much of this doc is copied
    * from elsewhere" score that drives span-removal or doc-dropping
    * policies.
    *
    * Plan shape for 100 TB: spans shuffle by the 8-byte xxhash64 of the
    * n-gram, never by the n-gram text (the 64-bit collision rate is
    * negligible below ~10^9 distinct n-grams and only perturbs counts,
    * not the schema of the result); the document-frequency side is
    * (hash → distinct-doc count), map-side combinable; the flag join is
    * hash-to-hash. Docs shorter than n words have no spans and are
    * absent from the output.
    */
  def duplicatedSpans(docs0: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val ws = filter(split(col(textCol), " "), w => w =!= "")
    val grams = transform(
      sequence(lit(0), size(ws) - n),
      i => xxhash64(array_join(slice(ws, i + 1, lit(n)), " ")))
    val spans = docs
      .filter(size(ws) >= n)
      .select(col(idCol).as("id"), explode(grams).as("sh"))
    val docFreq = spans.select(col("id"), col("sh")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("_df"))
    spans.join(docFreq, "sh")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("_df") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
      .select(col("id").as(idCol), col("n_spans"), col("n_dup_spans"),
        round(col("n_dup_spans").cast("double") / col("n_spans"), 4)
          .as("dup_frac"))
  }

  /** Span REMOVAL (the transform behind the [[duplicatedSpans]] stats —
    * Lee et al. 2022's exact-substring dedup): emit each document's
    * cleaned text with the words covered by cross-document duplicated
    * n-gram spans dropped. Policy: a span occurring in >= 2 distinct
    * documents is kept only by the document with the SMALLEST id
    * (keep-first-occurrence; the keeper keeps all its in-doc copies),
    * every other document drops all words covered by any occurrence of
    * that span. Output: (idCol, clean_text, n_kept, n_dropped) for
    * every input document (docs shorter than n words pass through
    * unchanged; clean_text is single-space re-joined).
    *
    * Plan shape for 100 TB: spans shuffle as (id, pos, 8-byte xxhash64)
    * — never the n-gram text; the span stats (distinct-doc count +
    * min id) are map-side combinable after the per-doc distinct; the
    * drop list collapses to ONE row per affected doc (the array of
    * dropped span starts), so the only join touching full text is
    * docs ⋈ drop-starts by id — bucket the docs table by id
    * ([[graft.sinks.BucketedTables]]) and that join is shuffle-free.
    * The word-drop itself is a per-row codegen higher-order filter
    * (exists over the starts array), no explode of the corpus words.
    */
  def removeDuplicatedSpans(docs0: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val docs = graft.engine.Par.widen(docs0)
    val ws = filter(split(col(textCol), " "), w => w =!= "")
    val grams = transform(
      sequence(lit(0), size(ws) - n),
      i => xxhash64(array_join(slice(ws, i + 1, lit(n)), " ")))
    val spans = docs
      .filter(size(ws) >= n)
      .select(col(idCol).as("id"), posexplode(grams))
      .select(col("id"), col("pos"), col("col").as("sh"))
    val stats = spans.select(col("id"), col("sh")).distinct()
      .groupBy(col("sh"))
      .agg(count(lit(1)).as("_ndocs"), min(col("id")).as("_keep"))
      .filter(col("_ndocs") >= 2)
    val dropStarts = spans.join(stats, "sh")
      .filter(col("id") =!= col("_keep"))
      .groupBy(col("id")).agg(collect_set(col("pos")).as("_starts"))
    val starts = coalesce(col("_starts"),
      array().cast("array<int>"))
    val kept = filter(ws, (_, i) =>
      !exists(starts, s => i >= s && i <= s + lit(n - 1)))
    docs.join(dropStarts, docs(idCol) === dropStarts("id"), "left")
      .select(docs(idCol),
        array_join(kept, " ").as("clean_text"),
        size(kept).cast("long").as("n_kept"),
        (size(ws) - size(kept)).cast("long").as("n_dropped"))
  }

  private def saltedHash(c: Column, salt: Int): Column =
    xxhash64(lit(salt), c)

  /** MinHash signature: for each of `numHashes` salted hash functions,
    * the minimum over the doc's shingles. Computed with one groupBy —
    * signature entries are `min(saltedHash)` aggregates, so the whole
    * signature is a single map-side-combinable shuffle. Output packs
    * the signature into one `sig: ARRAY<BIGINT>` column (narrow rows
    * through the downstream joins).
    */
  def minHashSignature(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val aggs = (0 until numHashes).map(i =>
      min(saltedHash(col("shingle"), i)).as(s"mh$i"))
    sh.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"mh$i")): _*).as("sig"))
  }

  /** MinHash + banded LSH candidate pairs, optionally verified against
    * the true Jaccard estimate from the full signature.
    *
    * `numHashes = bands * rowsPerBand`. Docs colliding on any band's
    * row-hash tuple become candidates (shuffle on band bucket), then the
    * estimated Jaccard (fraction of agreeing signature positions) is
    * computed per candidate pair and thresholded. The expensive all-pairs
    * comparison never happens — only hash-bucket collisions are joined.
    */
  def minHashPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = minHashSignature(docs, idCol, textCol, n, numHashes).cache()

    val buckets = bandBuckets(sig, bands, rowsPerBand)
    val candidates = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()

    verifyEstJaccard(candidates, sig, sig, threshold)
  }

  /** Band buckets: (band, hash(row-slice of the signature)) per doc. */
  private def bandBuckets(sig: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame =
    sig.select(col("id"), explode(array(
      (0 until bands).map(b => struct(lit(b).as("band"),
        xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
          .as("bkt"))): _*
    )).as("bb")).select(col("id"), col("bb.band"), col("bb.bkt"))

  /** Verify candidate pairs with the signature-estimated Jaccard
    * (codegen kernel over the packed signature arrays), keep those at
    * or above `threshold`.
    */
  private def verifyEstJaccard(candidates: DataFrame, sigA: DataFrame,
      sigB: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    val agree = column(graft.functions.LongArrayAgreeFrac(
      expression(col("siga")), expression(col("sigb"))))
    candidates
      .join(sigA.select(col("id").as("a"), col("sig").as("siga")), Seq("a"))
      .join(sigB.select(col("id").as("b"), col("sig").as("sigb")), Seq("b"))
      .withColumn("est_jac", agree)
      .filter(col("est_jac") >= threshold)
      .select(col("a"), col("b"), round(col("est_jac"), 4).as("est_jac"))
  }

  /** The persistable MinHash signature index for a corpus: (id, sig).
    * Write this to parquet once; [[minHashPairsAgainst]] dedups any
    * later batch against it without touching the corpus text again.
    */
  def minHashIndex(docs: DataFrame, idCol: String, textCol: String,
      n: Int, bands: Int = 16, rowsPerBand: Int = 4): DataFrame =
    minHashSignature(docs, idCol, textCol, n, bands * rowsPerBand)

  /** INCREMENTAL near-dup dedup: detect pairs between a NEW batch and
    * an EXISTING corpus represented only by its persisted signature
    * index ([[minHashIndex]] output read back from storage) — the
    * production delta shape: the old corpus is never re-read, never
    * re-shingled, never re-signed. Returns (a = index id, b = batch id,
    * est_jac >= threshold); batch-internal pairs are out of scope (run
    * [[minHashPairs]] on the batch for those), and a == b self-matches
    * are excluded so re-checking a batch already in the index is safe.
    *
    * Plan shape for 100 TB: the index side ships only (id, sig) rows —
    * band buckets are derived from 8-byte slices of the stored
    * signature, so incremental cost is |index| narrow rows + full
    * processing of the (small) batch; the bucket equi-join shuffles
    * three-long rows, and with a small batch the batch side broadcasts.
    * `index` must have been built with the same (n, bands, rowsPerBand).
    */
  def minHashPairsAgainst(index: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, n: Int, threshold: Double,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val batchSig =
      minHashSignature(batch, idCol, textCol, n, bands * rowsPerBand).cache()
    pairsAgainstSigs(index.select(col("id"), col("sig")), batchSig,
      threshold, bands, rowsPerBand)
  }

  /** Signature-level core of [[minHashPairsAgainst]]: both sides are
    * already (id, sig).
    */
  private[operators] def pairsAgainstSigs(idxSig: DataFrame, batchSig: DataFrame,
      threshold: Double, bands: Int, rowsPerBand: Int): DataFrame = {
    val candidates = bandBuckets(idxSig, bands, rowsPerBand).as("x")
      .join(bandBuckets(batchSig, bands, rowsPerBand).as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
        col("x.id") =!= col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    verifyEstJaccard(candidates, idxSig, batchSig, threshold)
  }

  /** The FULL production delta-dedup loop as a streaming sink: wire
    * into `stream.writeStream.foreachBatch(...)`. Every micro-batch is
    * (1) near-dup-checked against the persisted signature index — the
    * union of every earlier batch, never re-read as text — with the
    * detected (a = indexed id, b = batch id, est_jac) pairs appended to
    * `pairsPath`, then (2) its own signatures are appended to
    * `indexPath` so later batches dedup against it. The index grows by
    * |batch| narrow (id, sig, batch_id) rows per batch; per-batch cost
    * is the batch's shingling plus a bucket join against stored
    * signature slices.
    *
    * Delivery: both outputs carry `batch_id`, so a replayed batch
    * (restart between the two writes) appends duplicate rows rather
    * than corrupting state — readers dedup on (id, batch_id) /
    * (a, b, batch_id), the same read-side-idempotence contract the
    * reference's at-least-once ack model implies; wiring the writes
    * through `SqlSink.idempotentForeachBatch`'s marker pattern upgrades
    * it to exactly-once.
    */
  def minHashDedupStream(idCol: String, textCol: String, n: Int,
      threshold: Double, indexPath: String, pairsPath: String,
      bands: Int = 16, rowsPerBand: Int = 4): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val sig =
        minHashSignature(batch, idCol, textCol, n, bands * rowsPerBand)
          .cache()
      val existing =
        try Some(spark.read.parquet(indexPath).select(col("id"), col("sig")))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      existing match {
        case Some(idx) =>
          pairsAgainstSigs(idx, sig, threshold, bands, rowsPerBand)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(pairsPath)
        case None => () // first batch: nothing to dedup against
      }
      sig.withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(indexPath)
      sig.unpersist()
      ()
    }
  }

  /** 64-bit SimHash over word tokens: per bit, sum +1/-1 weighted by the
    * token hash's bit value; fingerprint bit = sign of the sum.
    * Runs as a single per-row codegen kernel
    * ([[graft.functions.VecKernels.simHash64]]) — a pure map with NO
    * shuffle, vs. the naive explode→groupBy plan that would shuffle
    * every token of a 100 TB corpus.
    */
  def simHash(docs0: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    val docs = graft.engine.Par.widen(docs0)
    val words = filter(split(col(textCol), " "), w => w =!= "")
    docs.select(col(idCol).as("id"),
      column(graft.functions.SimHash64(expression(words))).as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup cluster SURVIVOR selection — the step that turns a pair
    * list into the actual dedup decision a pipeline executes. Pairs
    * (from [[minHashPairs]], [[simHashPairs]], [[jaccardAuto]], ...)
    * become clusters via [[Components.connectedComponents]]; within
    * each cluster exactly one row survives: the LONGEST document
    * (`lenCol`), ties broken toward the smallest id — "keep the most
    * complete copy", the usual policy when near-dups are truncations
    * of each other (keep-lowest-id is [[exact]]'s convention; this is
    * its content-aware sibling).
    *
    * Output: (idCol, cluster, keep 0/1) for EVERY input row;
    * singletons (no incident pair) form their own cluster and survive.
    *
    * Plan shape for 100 TB: components run over the (tiny) pair list,
    * never the corpus; the winner per cluster is one map-side-
    * combinable max_by groupBy over |clustered docs| rows; the corpus
    * itself joins the (broadcast-sized) cluster map by id only.
    */
  def nearDupSurvivors(docs: DataFrame, idCol: String, lenCol: String,
      pairs: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    val comps = Components.connectedComponents(pairs, aCol, bCol)
    val member = docs
      .select(col(idCol).as("id"), col(lenCol).cast("bigint").as("_len"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("cluster"),
        col("_len"))
    // winner = max over struct(len, -id): longest doc, then smallest id
    val winners = member.groupBy(col("cluster"))
      .agg(max(struct(col("_len"), (-col("id")).as("_nid"))).as("_w"))
      .select(col("cluster"), (-col("_w._nid")).as("_win"))
    member.join(winners, "cluster")
      .select(col("id").as(idCol), col("cluster"),
        when(col("id") === col("_win"), 1L).otherwise(0L).as("keep"))
  }

  /** SimHash near-dup PAIRS: all (a, b) with
    * Hamming(simhash(a), simhash(b)) <= maxHamming — the classic
    * web-scale near-dup join over bit fingerprints.
    *
    * Blocking is exact by pigeonhole: split the 64-bit fingerprint
    * into maxHamming+1 bands; a pair within the Hamming budget differs
    * in at most maxHamming bands, so it matches at least one band
    * EXACTLY. Candidates come from a band-bucket equi-join (two longs
    * per row), verification is one bit_count(xor) per candidate —
    * no cross join, full recall (blocking loses nothing).
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 63]")
    fingerprintPairs(simHash(docs, idCol, textCol), "id", "simhash",
      maxHamming)
  }

  /** All pairs of 64-bit fingerprints within `maxHamming` bits — the
    * banded-join kernel behind [[simHashPairs]], exposed for ANY
    * stored fingerprint column (text SimHash, image dHash
    * ([[graft.multimodal.Multimodal.imageDHash]]), audio chromaprints):
    * pigeonhole banding guarantees two hashes within `maxHamming` agree
    * exactly on at least one of the `maxHamming+1` bit-slice bands, so
    * candidates come from equi-joins on (band, slice) — never all
    * pairs — and the exact `bit_count(xor)` verify runs per candidate
    * BEFORE the distinct, so non-qualifying candidates never enter the
    * pair shuffle.
    */
  def fingerprintPairs(fp0: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 63]")
    val fp = fp0.select(col(idCol).as("id"), col(fpCol).as("simhash"))
      .cache()
    val banded = simHashBands(fp, maxHamming)
    banded.select(col("id").as("a"), col("fp").as("fpa"), col("band"), col("bkt"))
      .join(banded.select(col("id").as("b"), col("fp").as("fpb"),
        col("band"), col("bkt")), Seq("band", "bkt"))
      .filter(col("a") < col("b"))
      .withColumn("hamming", hamming(col("fpa"), col("fpb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming").cast("bigint").as("hamming"))
      .distinct()
  }

  /** Pigeonhole banding of (id, simhash): maxHamming+1 bit-slice bands,
    * (id, fp, band, bkt) per band — derived with bit ops only, so it is
    * equally cheap over freshly computed or STORED fingerprints.
    */
  private def simHashBands(fp: DataFrame, maxHamming: Int): DataFrame = {
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val bands = (0 until nBands).map { b =>
      val lo = b * width
      val w = if (b == nBands - 1) 64 - lo else width
      val mask = if (w == 64) -1L else (1L << w) - 1
      shiftrightunsigned(col("simhash"), lo).bitwiseAND(lit(mask))
    }
    fp.select(col("id"), col("simhash"), posexplode(array(bands: _*)))
      .toDF("id", "fp", "band", "bkt")
  }

  /** Incremental SimHash near-dup: a NEW batch against the persisted
    * fingerprint index ([[simHash]] output, one (id, simhash) long per
    * doc — the cheapest possible dedup store) — same delta shape as
    * [[minHashPairsAgainst]]: the corpus text is never re-read; the
    * index side re-derives its pigeonhole bands from the stored 64-bit
    * fingerprints with bit ops only. Full recall within `maxHamming`
    * (pigeonhole blocking loses nothing); a == b self-matches excluded.
    * Returns (a = index id, b = batch id, hamming).
    */
  def simHashPairsAgainst(index: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 63]")
    val idxBands = simHashBands(index.select(col("id"), col("simhash")),
      maxHamming)
    val batchBands = simHashBands(simHash(batch, idCol, textCol), maxHamming)
    idxBands.select(col("id").as("a"), col("fp").as("fpa"), col("band"),
        col("bkt"))
      .join(batchBands.select(col("id").as("b"), col("fp").as("fpb"),
        col("band"), col("bkt")), Seq("band", "bkt"))
      .filter(col("a") =!= col("b"))
      .withColumn("hamming", hamming(col("fpa"), col("fpb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming").cast("bigint").as("hamming"))
      .distinct()
  }

  /** Streaming exact dedup: drop duplicate keys across micro-batches,
    * with state bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark` — keys older than the delay are
    * expired from the state store, the only way streaming dedup survives
    * unbounded input).
    */
  def streamingExact(stream: DataFrame, keyCols: Seq[String],
      tsCol: String, watermarkDelay: String): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Near-dup pairs by embedding cosine similarity, blocked by an
    * equi-join key (e.g. a label or an LSH bucket) so the pair space is
    * partitioned instead of crossed.
    */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.{cosineFromNorms, dot, normSq}
    val a = emb.select(col(idCol).as("a"), col(blockCol).as("blk"),
      col(vecCol).as("va"), normSq(col(vecCol)).as("na"))
    val b = emb.select(col(idCol).as("b"), col(blockCol).as("blk"),
      col(vecCol).as("vb"), normSq(col(vecCol)).as("nb"))
    a.join(b, Seq("blk")).filter(col("a") < col("b"))
      .withColumn("sim",
        cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("sim") > threshold)
      .select(col("a"), col("b"), round(col("sim"), 4).as("sim"))
  }

  /** Embedding near-dup pairs WITHOUT a natural blocking column:
    * random-hyperplane LSH buckets are the block key. `tables`
    * independent hashes; side A additionally probes its Hamming-ball
    * (`probeRadius`) of buckets, so high-similarity pairs collide with
    * probability ~1 while the pair space stays partitioned. Candidates
    * carry ids only; vectors re-attach for the exact cosine verify.
    * Approximate in recall (tune nPlanes/tables/probeRadius), exact in
    * precision (every emitted pair really clears the threshold).
    */
  def embeddingPairsLsh(emb0: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 8, tables: Int = 8,
      probeRadius: Int = 1): DataFrame = {
    import graft.functions.VectorFunctions.{cosineFromNorms, dot, normSq,
      hyperplaneBucket}
    val emb = graft.engine.Par.widen(emb0)
    val e = emb.select(
      col(idCol).as("id") +: col(vecCol).as("v") +:
      normSq(col(vecCol)).as("n") +:
      (0 until tables).map(t =>
        hyperplaneBucket(col(vecCol), nPlanes, seed = 1000 * t).as(s"bkt$t")): _*)
      .cache()
    val allBkts = (0 until tables).map(t => col(s"bkt$t"))
    val masks: Seq[Long] = (0 to probeRadius).flatMap(w =>
      (0 until nPlanes).combinations(w)
        .map(_.foldLeft(0L)((m, b) => m | (1L << b))))
    val exact = e.select(col("id"), posexplode(array(allBkts: _*)))
      .toDF("id", "tb", "bkt")
    val probed = exact
      .select(col("id"), col("tb"), explode(array(masks.map(m =>
        col("bkt").bitwiseXOR(lit(m))): _*)).as("bkt"))
    val candidates = probed.select(col("id").as("a"), col("tb"), col("bkt"))
      .join(exact.select(col("id").as("b"), col("tb"), col("bkt")),
        Seq("tb", "bkt"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    candidates
      .join(e.select(col("id").as("a"), col("v").as("va"), col("n").as("na")), Seq("a"))
      .join(e.select(col("id").as("b"), col("v").as("vb"), col("n").as("nb")), Seq("b"))
      .withColumn("sim",
        cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("sim") > threshold)
      .select(col("a"), col("b"), round(col("sim"), 4).as("sim"))
  }

  /** Soft deduplication: per-document sampling weights from n-gram
    * commonness (the SoftDedup idea — Xia et al. 2024, "rather than
    * dropping near-duplicate documents, down-weight documents built
    * from common n-grams in the training loss"). A doc whose grams
    * each appear in only one document scores 1 000 000 ppm (fully
    * novel, full weight); a doc assembled entirely from grams shared
    * by `k` docs scores ~1 000 000 / k. The novelty score here is the
    * harmonic mean of per-gram document frequencies, kept in EXACT
    * integer arithmetic (ppm units, integer `div`) so the result is
    * summation-order-proof and recomputable by the SQL oracle:
    *
    *   novelty_ppm(doc) = ( Σ_{g ∈ grams(doc)} 1 000 000 div df(g) )
    *                        div |grams(doc)|
    *
    * Plan shape for 100 TB: grams are distinct-per-doc 8-byte hashes
    * (never the strings); df(g) is ONE map-side-combinable groupBy of
    * the gram stream; the gram→df join shuffles (gram, doc) pairs once
    * (the standard inverted-index shape of [[jaccardPairs]]); the
    * per-doc reduce is map-side combinable again. Nothing quadratic,
    * no all-pairs — cost is O(total grams), i.e. linear in corpus
    * size, and ubiquitous grams (huge df) cost the same as rare ones.
    */
  def softDedupWeights(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val grams = shingles(docs, idCol, textCol, n)
      .select(col("id"), xxhash64(col("shingle")).as("g"))
    val df = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    grams.join(df, Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(expr("1000000 div df")).as("_s"))
      .select(col("id").as(idCol), col("n_grams"),
        expr("_s div n_grams").as("novelty_ppm"))
  }
}
