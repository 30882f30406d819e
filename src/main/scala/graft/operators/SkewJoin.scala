package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * runtime skew-join split isn't available (e.g. the skew is in a
  * broadcast-ineligible build side, or a non-AQE environment).
  *
  * Mechanics: the small/replicated side is exploded `saltFactor`× with
  * a salt column; each large-side row gets ONE deterministic salt
  * derived from hashing its whole row, so a hot key's rows spread over
  * `saltFactor` reducers instead of one. Join key becomes (key, salt).
  * Cost: small side inflated saltFactor×; use only for genuinely hot
  * keys (or pre-filter the hot keys and union a salted join of just
  * those with a plain join of the rest).
  */
object SkewJoin {

  /** Skew advisor: the one-pass key-distribution profile run BEFORE
    * committing a 100 TB join plan — per-key counts roll up to total
    * rows, distinct keys, the hottest key (min-id tiebreak) and its
    * count, the hot key's row share in exact ppm, and the salt factor
    * [[salted]] would need to level it (ceil of max/avg, all integer
    * arithmetic — aggregation-order independent, oracle-re-executable).
    *
    * Output: one row (n_rows, n_keys, hot_key, max_cnt, max_share_ppm,
    * salt_factor). Cost: one map-side-combinable groupBy + a 1-row
    * top-1 + one scalar agg; the table never shuffles wider than
    * (key, count).
    */
  def skewAdvisor(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val hot = counts.orderBy(col("cnt").desc, col(keyCol)).limit(1)
      .select(col(keyCol).as("hot_key"))
    counts.agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"))
      .crossJoin(broadcast(hot))
      .select(col("n_rows"), col("n_keys"), col("hot_key"), col("max_cnt"),
        // the products route through DECIMAL(38,0): max_cnt*n_keys (or
        // *1e6) can exceed Long.MaxValue exactly when skew is largest,
        // and non-ANSI BIGINT would wrap silently; `div` on decimals
        // still yields BIGINT, which the quotients always fit
        expr("CAST(max_cnt AS DECIMAL(38,0)) * 1000000 div n_rows")
          .as("max_share_ppm"),
        expr("(CAST(max_cnt AS DECIMAL(38,0)) * n_keys + n_rows - 1) div n_rows")
          .as("salt_factor"))
  }

  def salted(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // deterministic per-row salt: hash of all large-side columns
    val saltExpr = pmod(
      xxhash64(large.columns.map(col).toSeq: _*), lit(saltFactor.toLong))
    val l = large.withColumn("__salt", saltExpr)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    l.join(s, l(key) === s(key) && l("__salt") === s("__salt"), joinType)
      .drop("__salt")
  }
}
