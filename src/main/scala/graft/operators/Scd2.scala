package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 maintenance: apply a batch of
  * keyed attribute updates to a versioned dimension table where each
  * row carries a validity interval [valid_from, valid_to) and the
  * current version has valid_to = NULL.
  *
  * Semantics per dimension key:
  *   - update with a CHANGED attribute closes the current row (its
  *     valid_to := update ts) and opens a new current row;
  *   - update with an unchanged attribute is a no-op (idempotent
  *     re-delivery of the same state never forks a version);
  *   - update for an unseen key inserts a first current row;
  *   - historical (closed) rows pass through untouched.
  * When several updates for one key arrive in one batch, only the
  * LATEST (ts desc, then attr desc — max over the (ts, attr) struct)
  * is applied — the standard "dedupe the delta before merge" contract.
  *
  * Plan shape for 100 TB: one groupBy(key) to pick each key's latest
  * update, one join(key) of current rows to the (usually much smaller)
  * delta — history rows don't join at all; the dimension is never
  * shuffled wider than (key, attr, interval). This is the logical MERGE
  * a Delta/Iceberg sink would run; here it produces the new table
  * snapshot for an overwrite-style sink.
  */
object Scd2 {

  /** @param dim     current dimension: keyCol, attrCol, valid_from, valid_to
    * @param updates delta: keyCol, attrCol, tsCol
    * @return        the merged dimension snapshot (same schema as dim)
    */
  def merge(dim: DataFrame, updates: DataFrame,
      keyCol: String, attrCol: String, tsCol: String): DataFrame = {
    // latest update per key (deterministic: ts desc, then attr asc)
    val latest = updates
      .groupBy(col(keyCol))
      .agg(max(struct(col(tsCol).as("ts"), col(attrCol).as("attr"))).as("u"))
      .select(col(keyCol), col("u.attr").as("_new_attr"),
        col("u.ts").as("_new_ts"))

    val history = dim.filter(col("valid_to").isNotNull)
    val current = dim.filter(col("valid_to").isNull)

    val joined = current.join(latest, Seq(keyCol), "full_outer")
    val changed = col("_new_attr").isNotNull && col("valid_from").isNotNull &&
      col(attrCol) =!= col("_new_attr")
    // current rows: closed if changed, untouched otherwise
    val keptOrClosed = joined.filter(col("valid_from").isNotNull)
      .select(col(keyCol), col(attrCol),
        col("valid_from"),
        when(changed, col("_new_ts")).otherwise(col("valid_to")).as("valid_to"))
    // opened rows: changed keys + brand-new keys
    val opened = joined
      .filter(col("_new_attr").isNotNull &&
        (col("valid_from").isNull || col(attrCol) =!= col("_new_attr")))
      .select(col(keyCol), col("_new_attr").as(attrCol),
        col("_new_ts").as("valid_from"),
        lit(null).cast(dim.schema("valid_to").dataType).as("valid_to"))

    history.select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"))
      .unionByName(keptOrClosed)
      .unionByName(opened)
  }
}
