package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._

/** Distributed triangle counting with degree-ordered orientation
  * (Suri & Vassilvitskii, WWW'11 — the MapReduce-era answer to the
  * question, still the right Spark plan): orient every undirected edge
  * from its lower-(degree, id) endpoint to its higher one, generate
  * wedges only from each node's OUT-neighbors, and close them against
  * the oriented edge list.
  *
  * Why orientation is the whole ballgame at scale: naive wedge
  * generation from a hub with degree d creates d² candidates — one
  * celebrity node in a 10^9-edge graph is a job-killer. Orientation
  * caps every out-degree at O(√m), so total wedge volume is O(m^1.5)
  * REGARDLESS of skew, with no special-casing, salting, or hub
  * filtering. The plan is three equi-joins and one count — every one
  * of them hash-partitioned, AQE-rebalanceable, nothing broadcast but
  * nothing driver-side either.
  *
  * Each triangle is counted exactly once: its three oriented edges
  * contain exactly one node with out-edges to the other two (the
  * (deg,id)-minimum corner), and the closing join matches the single
  * oriented edge between those two.
  */
object Triangles {

  /** Count triangles in an undirected graph. `edges` must hold each
    * undirected edge once as (u, v) with u < v, no self-loops.
    * Returns a single row (n_triangles).
    */
  def count(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
    val deg = e.select(col("u").as("x"))
      .unionAll(e.select(col("v").as("x")))
      .groupBy(col("x")).agg(functions.count(lit(1)).as("dg"))
    val withDeg = e
      .join(deg.select(col("x").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("dg").as("dv")), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // each oriented edge carries its target's (deg, id) rank so the
    // wedge self-join can emit each out-neighbor pair ONCE, already in
    // closing-edge orientation (a→b iff (da,a) < (db,b)) — half the
    // wedge volume of the ordered-pairs formulation and each triangle
    // matched exactly once at its (deg,id)-minimum corner
    val o = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("t"),
      when(uFirst, col("dv")).otherwise(col("du")).as("dt"))
    val wedges = o.select(col("s"), col("t").as("a"), col("dt").as("da"))
      .join(o.select(col("s"), col("t").as("b"), col("dt").as("db")), "s")
      .filter(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")))
      .select(col("a").as("s"), col("b").as("t"))
    wedges.join(o.select(col("s"), col("t")), Seq("s", "t"))
      .agg(functions.count(lit(1)).as("n_triangles"))
  }
}
