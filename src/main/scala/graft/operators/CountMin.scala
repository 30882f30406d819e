package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005) as a pair of
  * DataFrame transforms: a `depth × width` counter table built with ONE
  * map-side-combinable aggregation, and a broadcast-probe estimator.
  *
  * The sketch is the mergeable-summary answer to per-key frequency at
  * 100 TB: the counter table is ≤ depth·width rows REGARDLESS of the
  * key domain (vs `groupBy(key).count`, which shuffles every distinct
  * key), partials combine by elementwise addition under any partition
  * or merge order, and the probe side broadcasts the whole table.
  * Guarantees: estimate ≥ true count always (counters only ever add);
  * estimate ≤ true count + ε·N with probability 1−δ for width = ⌈e/ε⌉,
  * depth = ⌈ln 1/δ⌉. Certified in SketchSpec (overestimate-only +
  * merge-equals-rebuild); the q147 golden pin freezes the estimates,
  * since the bucket layout is engine-defined (xxhash64).
  */
object CountMin {

  /** The `depth × width` counter table for `keyCol`: one row per
    * non-empty (r, bucket) cell, `cnt` = how many input rows hash
    * there under hash row r. One scan, one shuffle of ≤ depth·width
    * combined cells.
    */
  def table(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    df.select(col(keyCol).as("cm_key"))
      .select(col("cm_key"),
        explode(array((0 until depth).map(lit(_)): _*)).as("r"))
      .groupBy(col("r"),
        pmod(xxhash64(col("r"), col("cm_key")), lit(width)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query estimates for `candidates(keyCol)`: min over the
    * depth hash rows of the probed cell. The counter table is tiny by
    * construction, so it broadcasts; absent cells count 0.
    */
  def estimate(table: DataFrame, candidates: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame =
    candidates.select(col(keyCol).as("est_key"))
      .select(col("est_key"),
        explode(array((0 until depth).map(lit(_)): _*)).as("er"))
      .withColumn("eb", pmod(xxhash64(col("er"), col("est_key")), lit(width)))
      .join(broadcast(table),
        col("er") === col("r") && col("eb") === col("bucket"), "left")
      .groupBy(col("est_key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .select(col("est_key").as(keyCol), col("est"))
}
