package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differentially-private histogram release (the Dwork et al.
  * Laplace mechanism with the two ingredients production releases
  * actually need at scale — completing the privacy set next to
  * k-anonymity / l-diversity / t-closeness):
  *
  *  1. CONTRIBUTION BOUNDING: each user contributes at most
  *     `maxPerUser` rows (rank by a deterministic per-user order and
  *     cut), so the histogram's sensitivity under add/remove-user
  *     adjacency is exactly `maxPerUser` — without the bound a heavy
  *     user makes the sensitivity unbounded and no finite noise is
  *     private;
  *  2. Laplace(maxPerUser / ε) noise per bucket count;
  *  3. τ-THRESHOLDING: buckets whose noisy count falls below `tau`
  *     are suppressed — the standard guard that keeps rare buckets
  *     (potentially one person) out of the release.
  *
  * Noise is SEEDED — u ∈ (0,1) is a pure md5 function of
  * (seed, bucket), inverse-CDF'd to Laplace — the repo's
  * deterministic-randomness contract (the q154/q174 convention): the
  * release is reproducible on any cluster/partitioning and the
  * oracle replays it in SQL. (A production deployment would swap the
  * seeded u for a secure RNG; everything else — bounding,
  * sensitivity, thresholding — is the real machinery and is what
  * this operator certifies.)
  *
  * Plan shape for 100 TB: the bound is one per-user window over
  * (user, rank-key) pairs; counts are one map-side-combinable
  * groupBy; noise + threshold are per-bucket projections over
  * |buckets| rows.
  */
object Privacy {

  /** u ∈ (0,1) from the first 15 md5 hex chars of (seed|bucket) —
    * 60 bits, the [[Sampling]] convention, +0.5 so u is never 0.
    */
  private def uniform(bucket: org.apache.spark.sql.Column,
      seed: String): org.apache.spark.sql.Column =
    (conv(substring(md5(concat_ws("|", lit(seed), bucket)), 1, 15),
      16, 10).cast("double") + lit(0.5)) / lit(math.pow(2.0, 60))

  /** The DP histogram: `(bucket, noisy_count)` rows for buckets
    * surviving the threshold. `rowKeyCol` orders each user's rows
    * deterministically for the contribution cut.
    */
  def dpHistogram(df: DataFrame, userCol: String, bucketCol: String,
      rowKeyCol: String, maxPerUser: Int, epsilon: Double,
      tau: Double, seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxPerUser >= 1 && epsilon > 0, "need maxPerUser>=1, eps>0")
    val w = Window.partitionBy(col(userCol))
      .orderBy(md5(concat_ws("|", col(userCol), col(rowKeyCol))))
    val bounded = df
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxPerUser)
    val counts = bounded.groupBy(col(bucketCol).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val b = maxPerUser / epsilon
    val u = uniform(col("bucket"), seed)
    // Laplace by inverse CDF: -b * sign(u - 1/2) * ln(1 - 2|u - 1/2|)
    val noise = lit(-b) * signum(u - lit(0.5)) *
      log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
    counts
      .withColumn("_noisy", col("n") + noise)
      .filter(col("_noisy") >= tau)
      .select(col("bucket"), round(col("_noisy"), 4).as("noisy_count"))
  }
}
