package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  * Unlike `randomSplit` (seed- and partitioning-dependent), assignment
  * is a pure function of a row's key: md5 prefix -> 16-bit bucket ->
  * threshold ranges. The same row lands in the same split on any
  * cluster, any partitioning, any engine — reproducible dataset cuts
  * are a correctness requirement for train/eval separation.
  */
object Sampling {
  val Buckets = 65536 // md5 first 4 hex chars

  /** Per-group budget selection: within each `groupCol`, rank rows by
    * (`scoreCol` desc, `idCol`) and keep them while the running
    * `costCol` total stays within `budget` — the "best N tokens per
    * domain" curation step of a training-mixture build.
    *
    * Plan shape for 100 TB: ONE window cumsum per group partition (no
    * self-join, nothing quadratic); the sort is per-group, bounded by
    * the largest group. Deterministic: the rank breaks score ties by
    * id, and the admitted set is a pure function of the data.
    */
  def budgetSelect(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, costCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(costCol)).over(w))
      .filter(col("_cum") <= budget)
      .drop("_cum")
  }

  /** 0..65535 bucket from the md5 of the key column. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key), 1, 4), 16, 10).cast("int")

  /** Adds a `split` column per the named fractions (must sum to ~1).
    * Ranges are cumulative over the bucket space, boundaries computed
    * identically to the SQL oracle (floor of cumulative * 65536).
    */
  def deterministicSplit(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.floor(c * Buckets).toInt)
    val b = hashBucket(col(keyCol))
    val expr = fractions.zip(cuts).reverse.foldLeft(lit(fractions.last._1)) {
      case (acc, ((name, _), cut)) => when(b < cut, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Keep a deterministic `fraction` of rows (by key hash). */
  def deterministicSample(df: DataFrame, keyCol: String,
      fraction: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < math.floor(fraction * Buckets).toInt)

  /** Leakage-safe train/val/test split: every row sharing `groupCol`
    * (a near-dup cluster key, a normalized-text key, a user id) lands
    * in the SAME split, because the assignment hashes the group
    * REPRESENTATIVE — min(idCol) within the group — not the row. A
    * row-keyed split leaks: near-identical documents straddle the
    * train/test boundary and evaluation scores inflate (the
    * contamination failure q51/q69 decontamination exists to catch;
    * this is the split-time prevention).
    *
    * Plan shape: one window min over the group key (a single exchange
    * on `groupCol`); the split decision is then the same md5-bucket
    * pure row function as [[deterministicSplit]] — reproducible on any
    * engine or partitioning.
    */
  def groupAwareSplit(df: DataFrame, idCol: String, groupCol: Column,
      fractions: Seq[(String, Double)]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    deterministicSplit(
      df.withColumn("_rep", min(col(idCol)).over(w))
        .withColumn("_repkey", col("_rep").cast("string")),
      "_repkey", fractions)
      .drop("_repkey")
  }

  /** Temperature-balanced resampling across strata (the multilingual
    * rebalancing step of an LLM data mix, as in the GPT-3 / mT5 data
    * recipes): the target distribution is p^alpha renormalized, reached
    * by DOWNSAMPLING only — each stratum keeps rate
    * (n_min / n_stratum)^(1-alpha), so the smallest stratum keeps 100%
    * and larger strata shrink toward balance (alpha=1 keeps everything,
    * alpha=0 equalizes counts). Selection is the same md5-bucket pure
    * function of the row key as [[deterministicSplit]] — reproducible
    * on any engine/partitioning.
    *
    * Plan shape: stratum counts are one map-side-combinable groupBy
    * (|strata| rows), broadcast back; the keep decision is per-row
    * codegen. The data is never shuffled.
    */
  def temperatureSample(df: DataFrame, strataCol: String, keyCol: String,
      alpha: Double): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
    val nMin = counts.agg(min(col("_n")).as("_n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .withColumn("_thresh",
        floor(lit(Buckets.toDouble) *
          pow(col("_n_min").cast("double") / col("_n"), 1.0 - alpha))
          .cast("long"))
      .select(col(strataCol), col("_thresh"))
    df.join(broadcast(rates), strataCol)
      .withColumn("keep",
        (hashBucket(col(keyCol)).cast("long") < col("_thresh")).cast("int")
          .cast("long"))
      .drop("_thresh")
  }

  /** Target-mixture resampling: downsample each stratum so the OUTPUT
    * follows the given target weights (the "domain mixture" step of an
    * LLM data recipe — e.g. 30% web, 20% code, ... — as opposed to
    * [[temperatureSample]]'s power-law rebalance). Downsampling-only:
    * the achievable total is T = min_s(n_s / w_s) (the stratum that
    * binds keeps 100%), and stratum s keeps rate w_s * T / n_s.
    * Strata without a weight are dropped entirely. Selection is the
    * same md5-bucket pure function of the row key as
    * [[deterministicSplit]] — reproducible on any engine/partitioning.
    *
    * Plan shape: stratum counts are one map-side-combinable groupBy
    * (|strata| rows); weights are a literal broadcast; the keep
    * decision is per-row codegen. The data body is never shuffled.
    */
  def mixtureSample(df: DataFrame, strataCol: String, keyCol: String,
      weights: Seq[(String, Double)]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val wdf = weights.toDF(strataCol, "_w")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
      .join(wdf, strataCol)
    val tmax = counts
      .agg(min(col("_n").cast("double") / col("_w")).as("_t"))
    val rates = counts.crossJoin(broadcast(tmax))
      .withColumn("_thresh",
        floor(lit(Buckets.toDouble) * col("_w") * col("_t") / col("_n"))
          .cast("long"))
      .select(col(strataCol), col("_thresh"))
    df.join(broadcast(rates), strataCol)
      .withColumn("keep",
        (hashBucket(col(keyCol)).cast("long") < col("_thresh")).cast("int")
          .cast("long"))
      .drop("_thresh")
  }

  /** Mixture with UPSAMPLING (epoch repetition): like [[mixtureSample]]
    * but the output size is fixed at `sizeFactor × |input|` and strata
    * below their target weight REPEAT rows ("multiple epochs over a
    * small domain" — how real LLM mixes hit a 5% weight for a 0.5%-of-
    * corpus domain). Each row gets `n_copies = floor(f_s) + 1{bucket <
    * frac(f_s)·65536}` where `f_s = w_s · sizeFactor · N / n_s`, so
    * stratum totals land on target within rounding and the fractional
    * epoch picks rows by the same md5-bucket pure function as
    * [[deterministicSplit]]. Downstream materializes repeats with
    * `explode(sequence(1, n_copies))` when it needs physical rows.
    *
    * Plan shape: counts groupBy + two broadcast scalars; per-row
    * codegen copy count. The body is never shuffled.
    */
  def mixtureEpochs(df: DataFrame, strataCol: String, keyCol: String,
      weights: Seq[(String, Double)], sizeFactor: Double = 1.0): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val wdf = weights.toDF(strataCol, "_w")
    val counts0 = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
    // N = the WHOLE input (the documented contract: output lands on
    // sizeFactor × |input|), computed BEFORE the weight join — joining
    // first would silently shrink N when a stratum has no weight
    val total = counts0.agg(sum(col("_n")).cast("double").as("_total"))
    val counts = counts0.join(wdf, strataCol)
    val rates = counts.crossJoin(broadcast(total))
      .withColumn("_f",
        col("_w") * lit(sizeFactor) * col("_total") / col("_n"))
      .select(col(strataCol), floor(col("_f")).cast("long").as("_base"),
        floor((col("_f") - floor(col("_f"))) * Buckets).cast("long")
          .as("_thresh"))
    df.join(broadcast(rates), strataCol)
      .withColumn("n_copies",
        col("_base") +
          (hashBucket(col(keyCol)).cast("long") < col("_thresh"))
            .cast("int").cast("long"))
      .drop("_base", "_thresh")
  }

  /** Deterministic negative sampling for contrastive training: each
    * anchor row draws `k` pseudo-random partners by probing hash
    * buckets at fixed strides from its own bucket — a pure function of
    * the row keys, reproducible on any engine/partitioning (unlike
    * `rand()`-based sampling).
    *
    * Bucket b's representative = the row hashing to b with the
    * smallest SALTED hash (a pseudo-random pick, not min-id — min-id
    * would bias every negative toward early rows); anchor a probes
    * buckets (bucket(a) + j * 40503) mod nBuckets for j = 1..k (40503
    * is odd, hence coprime to any power-of-two ring). Probes into
    * empty buckets or back onto the anchor yield no row, so size
    * nBuckets well below the corpus (occupancy near 1) — each anchor
    * then gets its full k. The pool of distinct negatives is capped at
    * nBuckets, so pick nBuckets >> k for diversity.
    *
    * Plan shape for 100 TB: representatives are ONE map-side-combinable
    * min(struct(hash, id)) groupBy over at most nBuckets rows (the id
    * in the struct totalizes the order — duplicate keys share the
    * salted hash, and a bare min_by would tie-break engine-dependently),
    * broadcast to the probe join; anchors fan out k id-only rows each.
    * The corpus body never joins or shuffles.
    */
  def negativeSamples(df: DataFrame, idCol: String, keyCol: String,
      k: Int, nBuckets: Int = 4096): DataFrame = {
    val bucket = hashBucket(col(keyCol)) % nBuckets
    // min over struct(rh, neg_id): duplicate keys share the salted hash,
    // so a bare min_by(neg_id, rh) tie-breaks engine-dependently — the
    // id in the struct makes the representative a total order
    val pool = df
      .select(col(idCol).as("neg_id"), bucket.as("b"),
        md5(concat(lit("rep|"), col(keyCol))).as("rh"))
      .groupBy(col("b"))
      .agg(min(struct(col("rh"), col("neg_id"))).as("_r"))
      .select(col("b"), col("_r.neg_id").as("neg_id"))
    val probes = df
      .select(col(idCol).as("anchor_id"), bucket.as("ab"))
      .select(col("anchor_id"), explode(array((1 to k).map(j =>
        struct(lit(j.toLong).as("neg_rank"),
          ((col("ab") + lit(j * 40503)) % nBuckets).as("b"))): _*)).as("p"))
      .select(col("anchor_id"), col("p.neg_rank").as("neg_rank"),
        col("p.b").as("b"))
    probes.join(broadcast(pool), "b")
      .filter(col("neg_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("neg_rank"), col("neg_id"))
  }

  /** Per-stratum deterministic sampling: same fraction within every
    * value of `strataCol` (hash is salted with the stratum so strata
    * don't share bucket structure).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      fraction: Double): DataFrame =
    df.filter(
      conv(substring(md5(concat_ws("|", col(strataCol), col(keyCol))), 1, 4),
        16, 10).cast("int") < math.floor(fraction * Buckets).toInt)

  /** Weighted sampling WITHOUT replacement, n per stratum (Efraimidis–
    * Spirakis 2006 "Weighted random sampling with a reservoir" — the
    * public A-Res scheme): each row draws u ∈ (0,1] and ranks by
    * ln(u)/w descending; the top n per stratum are a bona-fide weighted
    * sample without replacement. Here u is the 60-bit md5 of the row
    * key mapped to (0,1] — the same pure-function-of-the-key
    * determinism contract as [[deterministicSplit]]: the sample is
    * reproducible on any cluster, any partitioning, any engine (the
    * oracle recomputes it in SQL).
    *
    * Plan shape for 100 TB: rank + u are per-row codegen; the top-n cut
    * is a per-stratum selection over rank keys, i.e. the shuffle
    * carries (stratum, key-rank) pairs and the window sorts within
    * strata only — never a global sort. (For huge strata swap the
    * window for [[TopKAggregator]]; at n·|strata| output scale both
    * shapes hold.) Weights must be strictly positive.
    */
  def weightedSample(df: DataFrame, strataCol: String, keyCol: String,
      weight: Column, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // u in (0,1]: (h+1)/2^60 over the 60-bit md5 hash — never 0, so
    // ln(u) is finite; ties impossible while keys are distinct
    val u = (Kmv.hash60(col(keyCol)) + 1).cast("double") / lit(Kmv.SpaceSize)
    val esKey = log(u) / weight.cast("double")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("_es").desc, col(keyCol))
    df.withColumn("_es", esKey)
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= n)
      .drop("_es")
  }

  /** Per-group frequency cap — the web-corpus curation step that stops
    * one over-crawled domain/feed from dominating a training mix (the
    * CCNet/RefinedWeb "cap documents per domain" rule): keep at most
    * `cap` rows per group, chosen by the deterministic 60-bit md5 rank
    * of (group, key) — a pure function of the data, reproducible on
    * any cluster/partitioning and recomputable by the SQL oracle.
    * Since the rank key is a uniform hash, the kept set is an unbiased
    * fixed-size subsample of the group.
    *
    * Skew-aware plan: one map-side-combinable count pass finds the
    * over-cap groups — typically FEW (the heavy hitters are the reason
    * the cap exists) and tiny (one row per group), so they broadcast.
    * The under-cap mass passes through via a broadcast ANTI join —
    * narrow, never shuffled — and only rows of over-cap groups pay the
    * per-group rank window. For a pathological single group holding a
    * whole partition's worth of rows, pre-thin with a hash threshold
    * (`hash60 < 2^60 * cap * slack / count`) before the exact window;
    * the uniform hash makes the survivor count sharply concentrated.
    */
  /** DSIR-style data selection via hashed-n-gram importance weights
    * (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling", NeurIPS): score every raw document by
    * how much its hashed unigram+bigram profile resembles a TARGET
    * corpus rather than the raw pool, keep the top-`quota` scorers.
    *
    *   log w(doc) = Σ_b n_b(doc) · (ln p̂_target[b] − ln p̂_raw[b])
    *
    * over `nBuckets` md5 hash buckets with add-λ (λ=0.5) smoothing.
    *
    * Determinism / cross-engine certification: the ONLY floating-point
    * step is the per-bucket log-ratio, computed once on the ≤B-row
    * bucket table and immediately quantized to exact micro-units
    * (ROUND(·×1e6) BIGINT) — the per-doc score is then an exact
    * integer dot product, immune to summation order (the q212/q250
    * lesson applied preemptively: a doc sums hundreds of terms, so a
    * rounded double total WOULD flap at the boundary). Selection is
    * (score desc, id) — a pure function of the corpus.
    *
    * Scale: one tokenization pass per corpus (bigrams via the q139
    * per-doc lead window, no token self-join); bucket histograms are
    * map-side combinable to ≤B rows and BROADCAST back; per-doc
    * scoring is one (doc, bucket) partial aggregation + a broadcast
    * join — the corpus shuffles once, carrying 16-byte pairs. The
    * top-quota cut is TakeOrderedAndProject (quota-bounded driver
    * result), never a global sort.
    */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, quota: Int, nBuckets: Int = 4096): DataFrame = {
    val lambdaN = 0.5
    val hexDigits = (math.log(nBuckets) / math.log(16)).toInt
    require((1 << (4 * hexDigits)) == nBuckets,
      s"nBuckets must be a power of 16, got $nBuckets")
    def bucket(feature: Column): Column =
      conv(substring(md5(feature), 1, hexDigits), 16, 10).cast("long")
    // unigram + adjacent-bigram features, one tokenization pass
    def features(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      val tok = df.select(col(idCol),
          posexplode(split(col(textCol), " ")).as(Seq("pos", "wd")))
        .filter(col("wd") =!= "")
      val uni = tok.select(col(idCol), bucket(col("wd")).as("b"))
      val big = tok.withColumn("nxt", lead(col("wd"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col(idCol),
          bucket(concat(col("wd"), lit(" "), col("nxt"))).as("b"))
      uni.unionAll(big)
    }
    val rawF = features(raw)
    val tgtF = features(target)
    // the per-doc bucket counts are computed FIRST and the corpus
    // histogram rolls up from them — the raw corpus is tokenized
    // exactly once (Catalyst won't CSE the two aggregations over the
    // shared window subtree, so deriving rawB independently would pay
    // the tokenization shuffle twice)
    val docB = rawF.groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("n"))
    val rawB = docB.groupBy(col("b")).agg(sum(col("n")).as("c_raw"))
    val tgtB = tgtF.groupBy(col("b")).agg(count(lit(1)).as("c_tgt"))
    val totals = rawB.agg(sum(col("c_raw")).as("t_raw"))
      .crossJoin(tgtB.agg(sum(col("c_tgt")).as("t_tgt")))
    // every bucket a raw doc can hit appears in rawB, so rawB is the
    // ratio table's domain; absent target buckets smooth to λ
    val ratio = rawB
      .join(tgtB, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        round((log((coalesce(col("c_tgt"), lit(0L)) + lambdaN)
            / (col("t_tgt") + lambdaN * nBuckets))
          - log((col("c_raw") + lambdaN)
            / (col("t_raw") + lambdaN * nBuckets))) * 1e6, 0)
          .cast("long").as("lr_micro"))
    docB.join(broadcast(ratio), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("n") * col("lr_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(quota)
  }

  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rank = Kmv.hash60(concat_ws("|", col(groupCol), col(keyCol)))
    val overGroups = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_gc")).filter(col("_gc") > cap)
      .select(col(groupCol))
    val under = df.join(broadcast(overGroups), Seq(groupCol), "left_anti")
    val w = Window.partitionBy(col(groupCol)).orderBy(rank, col(keyCol))
    val over = df.join(broadcast(overGroups), Seq(groupCol), "left_semi")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap).drop("_rn")
    under.unionByName(over)
  }

  /** Seeded global shuffle + striped shard assignment for training
    * export — the "shuffle the corpus once, write N shards" step every
    * pretraining dataloader expects (docs must arrive in an order
    * uncorrelated with ingest order, and the order must be
    * reproducible run-to-run so a resumed job reads the same stream).
    *
    * Each row gets `skey` = md5(seed|id) (the global shuffle order)
    * and `shard` = its 60-bit prefix mod `nShards`. Both are pure
    * functions of (seed, id): the same doc lands in the same shard at
    * the same position on any cluster, any partitioning, any engine —
    * and changing the seed is a full, independent reshuffle.
    *
    * Plan shape for 100 TB: ONE shuffle (the `repartition` on shard —
    * inherent: a global shuffle must move every row once) followed by
    * a within-partition sort that spills; no global sort, no window,
    * no driver state. The md5 is uniform, so shards are balanced to
    * ±O(√(rows/shards)) regardless of key skew, and `nShards` directly
    * controls output file count/size. Downstream:
    * `.write.partitionBy("shard")` or one file per partition.
    */
  def shuffleExport(df: DataFrame, idCol: String, nShards: Int,
      seed: String): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val key = md5(concat_ws("|", lit(seed), col(idCol).cast("string")))
    df.withColumn("skey", key)
      .withColumn("shard",
        pmod(conv(substring(col("skey"), 1, 15), 16, 10).cast("bigint"),
          lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("skey"))
  }

  /** Concat-and-chunk SEQUENCE PACKING — the LLM-pretraining
    * dataloader shape: documents are dealt to shards by a seeded md5
    * key (one worker's stream each), laid end-to-end in seeded order
    * within their shard, and the token stream is cut every `seqLen`
    * tokens; a document then occupies byte range
    * [start_off, start_off + n_tok) of its shard's stream and spans
    * chunks floor(start_off/L) .. floor((end-1)/L). Emitting the
    * SPAN (not one row per chunk) keeps output linear in documents.
    *
    * Plan shape: ONE shuffle (repartition by shard — the same
    * rows-move-once bound as [[shuffleExport]]) + a per-shard running
    * sum (each shard is one window partition, shards pack in
    * parallel — exactly how per-worker packing runs on a cluster).
    * Every output column is a pure function of (seed, ids, token
    * counts), so the oracle replays the packing bit-for-bit.
    *
    * Precondition: `idCol` must be unique — skey = md5(seed|id) is the
    * total order, and a duplicate id would make two rows peers whose
    * relative packing order is undefined in any engine. The frame is
    * pinned to ROWS UNBOUNDED PRECEDING..CURRENT ROW so the running
    * sum matches the oracle's ROWS frame even on tied keys (the
    * default RANGE frame would hand both peers the sum INCLUDING each
    * other).
    */
  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
      seqLen: Int, nShards: Int, seed: String): DataFrame = {
    require(seqLen > 0 && nShards > 0, "seqLen and nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat_ws("|", lit(seed), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("skey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("skey", key)
      .withColumn("shard",
        pmod(conv(substring(col("skey"), 1, 15), 16, 10).cast("bigint"),
          lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .withColumn("start_off",
        coalesce(sum(col(nTokCol)).over(w) - col(nTokCol), lit(0L)))
      .withColumn("chunk_first",
        floor(col("start_off") / seqLen.toLong))
      .withColumn("chunk_last",
        floor((col("start_off") + col(nTokCol) - 1) / seqLen.toLong))
  }

  /** Rendezvous (highest-random-weight) shard assignment — the
    * stability-under-resharding alternative to mod-N: each (key,
    * shard) pair gets an md5-derived 60-bit weight and the key goes
    * to the argmax shard. Growing N → N+1 moves ONLY the ~1/(N+1) of
    * keys whose new shard wins their argmax — every other key keeps
    * its shard — whereas mod-N resharding moves ~N/(N+1) of the
    * corpus. At 100 TB that difference is the whole cost of an
    * incremental re-export.
    *
    * Plan shape: a per-row `transform` over the N candidate weights +
    * `array_max` on (weight, shard) structs — pure codegen
    * projection, no shuffle, no UDF; N is small (shard counts, not
    * rows). The weight is a pure function of (key, shard), so the
    * assignment is engine- and partitioning-independent and the
    * oracle recomputes it exactly (max_by over an unnested candidate
    * relation).
    */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    require(nShards > 0, "nShards must be positive")
    val scores = transform(sequence(lit(0), lit(nShards - 1)),
      s => struct(
        conv(substring(md5(concat(key.cast("string"), lit(":"),
          s.cast("string"))), 1, 15), 16, 10).cast("bigint").as("h"),
        s.cast("bigint").as("s")))
    array_max(scores).getField("s")
  }

  /** Per-shard export manifest: row count, id span, and an
    * order-independent 60-bit content checksum (bit_xor of
    * md5(id|payload)) — what an export job writes next to its shards
    * so a re-export (different cluster, different parallelism,
    * different engine) can be certified byte-equivalent shard-by-shard
    * without re-reading both corpora side by side. XOR is commutative
    * and associative, so the checksum is identical under ANY row
    * order/partitioning; one map-side-combinable aggregation, output
    * |shards| rows.
    */
  def shardManifest(assigned: DataFrame, shardCol: String, idCol: String,
      payloadCol: String): DataFrame = {
    val h = conv(substring(md5(concat_ws("|",
      col(idCol).cast("string"), col(payloadCol))), 1, 15), 16, 10)
      .cast("bigint")
    assigned.withColumn("__h", h)
      .groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"),
        expr("bit_xor(__h)").as("checksum"))
  }

  /** Incremental manifest maintenance: fold a delta batch's manifest
    * into an existing corpus manifest WITHOUT re-reading the corpus —
    * counts add, id spans least/greatest, and the XOR checksum
    * composes (XOR is a group: combine = xor, identity = 0), so
    * combine(manifest(A), manifest(B)) ≡ manifest(A ∪ B) exactly.
    * At 100 TB this is the difference between touching |delta| bytes
    * and touching everything; the oracle certifies the equivalence by
    * recomputing the full manifest from scratch.
    */
  def combineManifests(a: DataFrame, b: DataFrame): DataFrame = {
    val bb = b.select(col("shard"), col("n_rows").as("n2"),
      col("min_id").as("mi2"), col("max_id").as("ma2"),
      col("checksum").as("c2"))
    a.select(col("shard"), col("n_rows").as("n1"), col("min_id").as("mi1"),
        col("max_id").as("ma1"), col("checksum").as("c1"))
      .join(bb, Seq("shard"), "full_outer")
      .select(col("shard"),
        (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L)))
          .as("n_rows"),
        least(col("mi1"), col("mi2")).as("min_id"),
        greatest(col("ma1"), col("ma2")).as("max_id"),
        coalesce(col("c1"), lit(0L)).bitwiseXOR(coalesce(col("c2"), lit(0L)))
          .as("checksum"))
  }
}
