package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003; the
  * MOSS index): the INCREMENTAL exact-substring detection store.
  *
  * Where [[SuffixDedup]] finds every duplicated region inside a
  * corpus it can re-rank wholesale, winnowing answers the DELTA
  * question — "does this arriving batch share a run of >= t
  * characters with anything already ingested?" — against a persisted
  * index of ~2n/(t-k) narrow (fingerprint, doc, pos) rows, never
  * re-reading corpus text (the [[Dedup.minHashIndex]] incremental
  * contract, on the exact-match axis instead of the jaccard axis).
  *
  * The guarantee (the paper's theorem): every window of w = t-k+1
  * consecutive k-gram hashes selects its minimum (rightmost on
  * ties), so ANY exact match of length >= t between two documents
  * shares at least one selected fingerprint — detection has no
  * false negatives at the t threshold, and density is provably
  * <= 2/(w+1) of positions in expectation.
  *
  * Spark shape: ONE window pass per document computes each
  * window's rightmost-argmin as `min(struct(hash, -pos))` over a
  * sliding ROWS frame (the struct ordering implements the
  * tie-break), then a distinct dedupes positions selected by
  * several windows. Partitioned by document — no corpus-wide
  * anything; the index grows by |batch| rows per ingest.
  */
object Winnow {

  /** Fingerprint table: (did, pos, fp) — `pos` is the 1-based start
    * of the selected k-gram, `fp` its xxhash64. Selection is
    * winnowing over windows of `t - k + 1` consecutive k-grams,
    * computed entirely scan-side by the one-pass monotonic-deque
    * kernel ([[graft.functions.WinnowKernels]]): the previous plan
    * exploded every gram through an Exchange(did) + sort and paid an
    * O(L·w) sliding-frame `min(struct(h, -pos))` per document; the
    * kernel emits the identical selection set (same xxhash64 grams,
    * same rightmost-min tie-break, same first-full-window rule, same
    * dedup) in O(L) inside whole-stage codegen with no shuffle at all.
    *
    * INPUT CONTRACT: `idCol` must be unique per row. The kernel's
    * consecutive-run dedup is per-document; the old plan's global
    * `.distinct()` would additionally have collapsed identical
    * (did, pos, fp) rows arising from DUPLICATE doc_id rows in the
    * input — such input now yields duplicate fingerprint rows.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, t: Int = 32): DataFrame = {
    require(k >= 2 && t > k, "need k >= 2 and t > k")
    val w = t - k + 1
    graft.engine.Par.widen(docs)
      .select(col(idCol).cast("long").as("did"),
        explode(graft.functions.WinnowFunctions
          .winnowSelect(col(textCol), k, w)).as("s"))
      .select(col("did"), col("s.pos").as("pos"), col("s.fp").as("fp"))
  }

  /** Candidate matches between a NEW batch and the persisted index
    * (`fingerprints` output read back): (a = index doc, b = batch
    * doc, n_shared, diag_runs) where n_shared counts shared
    * (fingerprint, alignment-agnostic) selections and diag_runs the
    * distinct diagonals (posA - posB) — a long exact match shows up
    * as many shared fingerprints on ONE diagonal. By the winnowing
    * guarantee, any >= t-char exact overlap yields n_shared >= 1;
    * thresholding on `minShared` trades recall below t for
    * precision. The join ships only narrow integer rows and the
    * batch side is small — the q68 incremental plan shape.
    */
  def matchesAgainst(index: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, k: Int = 8, t: Int = 32,
      minShared: Long = 1L, maxDf: Long = 64L): DataFrame =
    matchesSigs(index, fingerprints(batch, idCol, textCol, k, t),
      minShared, maxDf)

  /** [[matchesAgainst]] on two ALREADY-FINGERPRINTED sides —
    * the shape a caller uses when it needs the batch fingerprints
    * again afterwards (e.g. to extend the index with survivors).
    *
    * `maxDf` is MOSS's stop-fingerprint rule and the scale bound: a
    * fingerprint present in more than `maxDf` distinct INDEX documents
    * is boilerplate (license headers, templates) and is excluded from
    * pairing — without it one hot fingerprint shared by thousands of
    * docs makes the join quadratic (measured at sf0.1: a single df-
    * 3745 fingerprint contributed 18.4M of 29.8M candidate pairs).
    * The trade is explicit: matches consisting ONLY of over-common
    * text are not reported — which is the detector's intent.
    */
  def matchesSigs(indexFp: DataFrame, batchFp: DataFrame,
      minShared: Long = 1L, maxDf: Long = 64L): DataFrame = {
    val hot = indexFp.groupBy(col("fp"))
      .agg(countDistinct(col("did")).as("df"))
      .filter(col("df") > maxDf).select(col("fp"))
    indexFp.join(hot, Seq("fp"), "left_anti")
      .select(col("did").as("a"), col("pos").as("pa"), col("fp"))
      .join(batchFp.join(hot, Seq("fp"), "left_anti")
        .select(col("did").as("b"), col("pos").as("pb"), col("fp")),
        Seq("fp"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"),
        countDistinct(col("pa") - col("pb")).as("diag_runs"))
      .filter(col("n_shared") >= minShared)
  }
}
