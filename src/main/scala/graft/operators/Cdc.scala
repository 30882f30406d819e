package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC log application — the SCD1 (overwrite-in-place) sibling of
  * [[Scd2]]: apply a change log of (key, ts, op I/U/D, attrs) to a
  * snapshot, producing the new snapshot. Per key only the LATEST log
  * entry wins (ordered by (ts, op, attrs) — a total order, so replayed
  * or reordered deliveries converge to the same result); an
  * insert/update upserts the row, a delete removes it, keys absent
  * from the log pass through untouched.
  *
  * Plan shape for 100 TB: the winner per key is ONE map-side-combinable
  * `max(struct(...))` groupBy over the (small) delta; the snapshot's
  * only work is a key join against that delta (broadcast when the delta
  * is small, AQE decides) — the snapshot body is never re-sorted or
  * re-aggregated. This is the merge-on-read compaction step of every
  * lakehouse table format, expressed as a plain DataFrame transform.
  */
object Cdc {

  /** @param snapshot current table: keyCol + attrCols
    * @param log      change log: keyCol, tsCol, opCol ('I'/'U'/'D'),
    *                 attrCols (ignored for 'D')
    * @return the new snapshot (keyCol + attrCols)
    */
  def applyLog(snapshot: DataFrame, log: DataFrame, keyCol: String,
      tsCol: String, opCol: String, attrCols: Seq[String]): DataFrame = {
    val latest = log.groupBy(col(keyCol))
      .agg(max(struct(
        col(tsCol) +: col(opCol) +: attrCols.map(col): _*)).as("_c"))
      .select(col(keyCol) +: col(s"_c.$opCol").as(opCol) +:
        attrCols.map(a => col(s"_c.$a").as(a)): _*)
    val untouched = snapshot
      .join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
      .select(col(keyCol) +: attrCols.map(col): _*)
    val upserts = latest.filter(col(opCol) =!= "D").drop(opCol)
    untouched.unionByName(upserts)
  }
}
