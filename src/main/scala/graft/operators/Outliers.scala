package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metric-stream anomaly detection: per-group z-score outliers over a
  * numeric column (the "which events are wildly off their type's
  * distribution" question a pipeline asks of telemetry and of
  * per-document statistics alike).
  *
  * Determinism at scale is designed in: the mean/variance sums run over
  * a FIXED-POINT integer quantization of the value (`floor(value *
  * scale)` as a long), so the partial aggregates are exact integer
  * arithmetic — the result is bit-identical under any partitioning,
  * any aggregation order, any engine. A plain double `sum()` differs
  * in the last ulps between aggregation orders (and between engines),
  * which turns every downstream rounded comparison into a coin flip;
  * exact integer moments make the whole statistic a pure function of
  * the data. (With scale=100 and |value| <= ~10^6 the squared sums stay
  * far below 2^63; for wider ranges pick a smaller scale.)
  *
  * Plan shape: one map-side-combinable groupBy for the moments (output
  * = one row per group), broadcast back onto the stream, per-row codegen
  * z computation, filter. No shuffle of the event stream itself.
  */
object Outliers {

  /** Rows whose |value - mean| / stddev (sample stddev within
    * `groupCol`) exceeds `threshold`. Output: idCol, groupCol,
    * z (rounded to 4 decimals).
    */
  def zscoreOutliers(df0: DataFrame, idCol: String, groupCol: String,
      valueCol: String, threshold: Double, scale: Int = 100): DataFrame = {
    val df = graft.engine.Par.widen(df0)
    val iv = floor(col(valueCol) * scale).cast("long")
    val st = df
      .select(col(groupCol), iv.as("iv"))
      .groupBy(col(groupCol))
      .agg(sum(col("iv")).as("si"), sum(col("iv") * col("iv")).as("ssi"),
        count(lit(1)).as("cnt"))
    val variance =
      (col("ss") / (scale.toDouble * scale) -
        (col("s") / scale) * (col("s") / scale) / col("n")) / (col("n") - 1.0)
    // Degenerate groups (n < 2, or zero/negative variance from a constant
    // group) are excluded BEFORE the sqrt: engines disagree on 0/0 and
    // sqrt(-eps) (NULL vs inf/NaN), so the guard must be explicit and
    // identical on both sides of the oracle comparison.
    val mv = st.select(
        col(groupCol),
        col("si").cast("double").as("s"),
        col("ssi").cast("double").as("ss"),
        col("cnt").cast("double").as("n"))
      .select(col(groupCol), col("n"),
        (col("s") / scale / col("n")).as("m"), variance.as("v"))
      .filter(col("n") >= 2 && col("v") > 0)
      .select(col(groupCol), col("m"), sqrt(col("v")).as("sd"))
    df.join(broadcast(mv), groupCol)
      .withColumn("z", round(abs(col(valueCol) - col("m")) / col("sd"), 4))
      .filter(col("z") > threshold)
      .select(col(idCol), col(groupCol), col("z"))
  }

  /** Robust (MAD-based) outliers: |value - median| / (1.4826 · MAD)
    * exceeds `threshold`, where MAD is the median absolute deviation
    * within `groupCol`. Immune to the masking problem z-scores have
    * (one huge outlier inflates the stddev and hides the rest) — the
    * robust scale estimate a curation pipeline actually wants for
    * heavy-tailed telemetry.
    *
    * Determinism: both medians are EXACT interpolated percentiles —
    * pure functions of the sorted data, no summation-order sensitivity
    * at all (cross-engine interpolation equivalence is certified by
    * q128's winsorize oracle). Degenerate groups (MAD = 0, i.e. >half
    * the group shares one value) are excluded explicitly on both
    * engines, same contract as [[zscoreOutliers]]'s sd > 0 guard.
    *
    * Plan shape: TWO PASSES over the stream (median, then deviation
    * median) — the stream itself never enters an exchange, but it is
    * scanned twice, which is the correct trade at warehouse scale
    * (persisting a 100 TB deviation projection to save a re-scan is
    * not). Each pass is a |groups|-row aggregate broadcast back. Exact
    * percentile buffers each group's values once — the declared
    * test-scale semantics; at warehouse scale substitute
    * approx_percentile (≤5% path certified in SketchSpec, as with
    * q50/q128).
    */
  def madOutliers(df0: DataFrame, idCol: String, groupCol: String,
      valueCol: String, threshold: Double): DataFrame = {
    val df = graft.engine.Par.widen(df0)
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("ad", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(col(groupCol))
      .agg(expr("percentile(ad, 0.5)").as("mad"))
      .filter(col("mad") > 0)
    dev.join(broadcast(mad), groupCol)
      .withColumn("rz", round(col("ad") / (col("mad") * 1.4826), 4))
      .filter(col("rz") > threshold)
      .select(col(idCol), col(groupCol), col("rz"))
  }
}
