package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** MIN/MAX view maintenance — the classic NON-RETRACTABLE
    * aggregate: an insert folds into the old extreme for free
    * (max is insert-monotone), but a delete may remove the extreme
    * itself, and no amount of bookkeeping short of the full multiset
    * can say what the new one is. The standard trade (Gupta &
    * Mumick's "self-maintainability" boundary): refresh
    * GROUP-SELECTIVELY — groups untouched by deletes advance from the
    * old view + the feed's inserts alone (never re-scanned); only
    * groups with a delete recompute from the current snapshot, so
    * refresh cost rides |delete-touched groups|' rows, not the table.
    *
    * `view` = (key, agg) at the OLD version; `feed` = the change
    * feed over the window; `snapshot` = the NEW version (scanned only
    * for delete-touched groups via one semi join). `maxAgg=false`
    * maintains MIN.
    */
  def maintainExtreme(view: DataFrame, feed: DataFrame,
      snapshot: DataFrame, keyCol: String, valCol: String,
      maxAgg: Boolean = true): DataFrame = {
    val ext: Column => Column = if (maxAgg) max else min
    val deletedKeys = feed
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .select(col(keyCol)).distinct()
    // clean groups: old extreme + the feed's inserted values
    val insExt = feed
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .groupBy(col(keyCol)).agg(ext(col(valCol)).as("_ins"))
    val clean = view
      .join(deletedKeys, Seq(keyCol), "left_anti")
      .join(insExt, Seq(keyCol), "left")
      .select(col(keyCol),
        when(col("_ins").isNotNull && (
            if (maxAgg) col("_ins") > col(valCol)
            else col("_ins") < col(valCol)),
          col("_ins")).otherwise(col(valCol)).as(valCol))
    // delete-touched groups (plus brand-new keys): recompute from the
    // snapshot, restricted by one semi join
    val touched = snapshot
      .join(deletedKeys, Seq(keyCol), "left_semi")
      .groupBy(col(keyCol)).agg(ext(col(valCol)).as(valCol))
    val newKeys = insExt
      .join(view, Seq(keyCol), "left_anti")
      .join(deletedKeys, Seq(keyCol), "left_anti")
      .select(col(keyCol), col("_ins").as(valCol))
    clean.unionByName(touched).unionByName(newKeys)
  }
}
