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
