package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for JOIN views off change feeds —
  * the bilinear delta rule (the classical incremental join of
  * Blakeley et al. 1986, the same algebra DBSP/Materialize run):
  *
  *   Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * with every relation carried as SIGNED multiset rows (`_sign` = +1
  * insert / −1 delete) and signs MULTIPLYING across a join — a
  * delete joining an insert contributes −1, two deletes +1. The
  * three terms are disjoint by construction (old side vs delta side),
  * so the union is exact; downstream aggregates consume the signed
  * rows as retractable sums (the q321 contract, now fed by a JOIN).
  *
  * Scale shape: each term joins a DELTA (|changes|-sized) against
  * either a snapshot or the other delta — nothing is ever
  * |A|×|B|-shaped, and the snapshot side arrives as an equi-join that
  * AQE broadcasts when the delta is small. Refresh cost rides the
  * changed data, never the view's base tables.
  */
object Ivm {

  /** Signed delta of a join view. `aOld`/`bOld` are the PRE-window
    * snapshots; `dA`/`dB` carry `_sign` (+1/−1, e.g. from a change
    * feed's insert/delete rows). Output: joined rows + `_sign`.
    */
  def deltaJoin(aOld: DataFrame, dA: DataFrame, bOld: DataFrame,
      dB: DataFrame, keys: Seq[String]): DataFrame = {
    val aSnap = aOld.withColumn("_sign", lit(1L))
    val bSnap = bOld.withColumn("_sign", lit(1L))
    def term(l: DataFrame, r: DataFrame): DataFrame = {
      val lr = l.withColumnRenamed("_sign", "_sl")
      val rr = r.withColumnRenamed("_sign", "_sr")
      lr.join(rr, keys)
        .withColumn("_sign", col("_sl") * col("_sr"))
        .drop("_sl", "_sr")
    }
    term(dA, bSnap)
      .unionByName(term(aSnap, dB))
      .unionByName(term(dA, dB))
  }

  /** A change feed's rows as a signed delta: insert → +1, delete →
    * −1 (update pre/postimages are deletes/inserts already).
    */
  def signedFeed(cdf: DataFrame): DataFrame =
    cdf.withColumn("_sign",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
      .drop("_change_type", "_commit_version")
}
