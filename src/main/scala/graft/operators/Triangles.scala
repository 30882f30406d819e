package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._

/** Distributed triangle counting: degree-ordered orientation (Suri &
  * Vassilvitskii, WWW'11) + edge-iterator with a native merge-
  * intersect kernel.
  *
  * Orient every undirected edge from its lower-(degree, id) endpoint
  * to its higher one; then
  * {{{ triangles = Σ over oriented edges (a,b) of |N+(a) ∩ N+(b)| }}}
  * — triangle {x,y,z} is counted exactly once, at its single oriented
  * edge (a,b) whose two endpoints both point at the third corner.
  *
  * Why this shape survives 10^10 edges:
  *  - Orientation caps every out-degree at O(√m), so adjacency arrays
  *    are bounded regardless of hub skew (a degree-10^7 celebrity
  *    would otherwise explode any wedge/join plan) and total intersect
  *    work is O(m^1.5).
  *  - The intersection runs INSIDE a whole-stage-codegen kernel
  *    ([[graft.functions.VecKernels.sortedIntersect]], O(|a|+|b|)
  *    merge scan per edge) — the O(m^1.5) wedge set is never
  *    materialized, never shuffled, never even allocated. The only
  *    shuffles are one groupBy (adjacency build) and two equi-joins of
  *    the edge list against the |V|-row adjacency table.
  */
object Triangles {

  /** Count triangles in an undirected graph. `edges` must hold each
    * undirected edge once as (u, v) with u < v, no self-loops.
    * Returns a single row (n_triangles).
    */
  def count(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    val e = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
    // one pass over the edge list, not a self-union: the union form
    // re-evaluated the caller's edge BUILD (typically a join+distinct)
    // once per branch — ReuseExchange dedupes only the distinct's
    // shuffle, not the aggregate above it (the r15 symBoth lesson)
    val deg = e.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy(col("x")).agg(functions.count(lit(1)).as("dg"))
    val withDeg = e
      .join(deg.select(col("x").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("dg").as("dv")), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("t"))
    // sorted out-adjacency arrays, O(√m)-bounded by the orientation
    val adj = o.groupBy(col("s"))
      .agg(array_sort(collect_list(col("t"))).as("nbrs"))
    // per oriented edge: one codegen merge-intersect of the two
    // endpoint adjacency arrays. Inner joins are correct: an endpoint
    // absent from adj has no out-neighbors, contributing 0 anyway.
    val inter = column(graft.functions.SortedLongIntersect(
      expression(col("na")), expression(col("nb"))))
    o.join(adj.select(col("s").as("a"), col("nbrs").as("na")),
        col("s") === col("a"))
      .join(adj.select(col("s").as("b"), col("nbrs").as("nb")),
        col("t") === col("b"))
      .select(inter.as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
  }
}
