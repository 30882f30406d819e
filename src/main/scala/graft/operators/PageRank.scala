package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over a directed edge list, in FIXED-POINT
  * integer arithmetic (micro-units of 1e-6) so every contribution sum
  * is an exact BIGINT — bit-identical under any partitioning or
  * aggregation order, and therefore checkable against an unrolled SQL
  * oracle in another engine (the same determinism design as the
  * fixed-point moments in [[Outliers]]).
  *
  * Per iteration: each node sends `rank div outdeg` along its out
  * edges (integer division — the truncated remainder mass is dropped
  * deterministically by both engines), and every node's next rank is
  * `0.15·SCALE + (85 · Σ contribs) div 100`, all in BIGINT.
  *
  * Scale (Pregel-on-DataFrames): the edge list is the only large
  * relation; each iteration is one equi-join (ranks ⋈ edges on src —
  * both sides hash-partitioned on the same key, so AQE reuses the
  * exchange) plus one map-side-combinable groupBy on dst. Lineage is
  * cut every iteration with localCheckpoint — the local-mode analog of
  * the reliable HDFS checkpoint an iterative job needs on a cluster
  * (same pattern as the IVF k-means loop in [[Similarity]]).
  *
  * Callers must ensure every node has outdegree ≥ 1 (e.g. symmetrize
  * the edge list) — dangling-mass redistribution is deliberately out
  * of scope for the fixed-point contract.
  */
object PageRank {
  val Scale: Long = 1000000L

  /** @param edges (src: long, dst: long) directed edges, deduplicated.
    * @return (node, rank) with rank in micro-units (BIGINT).
    */
  def run(edges: DataFrame, iterations: Int): DataFrame = {
    // unique names per relation + by-name join conditions: ranks/outdeg
    // share the edge list's lineage, so Dataset-apply column references
    // would trip the ambiguous-self-join check on every iteration
    val e = edges.select(col("src").cast("long").as("e_src"),
      col("dst").cast("long").as("e_dst"))
    val outdeg = e.groupBy(col("e_src")).agg(count(lit(1)).as("d"))
      .select(col("e_src").as("o_src"), col("d"))
    // attach each edge's source outdegree ONCE, hash-partition the
    // result on the join key, and pin it: the big relation of the loop
    // is now shuffled a single time — every iteration's join re-uses
    // the layout, so only the |V|-row ranks side moves per round
    val ew = e.join(outdeg, col("e_src") === col("o_src"))
      .select(col("e_src"), col("e_dst"), col("d"))
      .repartition(col("e_src"))
      .persist()
    // every node appears as a src in a symmetrized edge list
    var ranks = outdeg.select(col("o_src").as("node"), lit(Scale).as("r"))
    for (_ <- 1 to iterations) {
      val contribs = ranks
        .join(ew, col("node") === col("e_src"))
        .select(col("e_dst").as("node2"), expr("r div d").as("c"))
      ranks = contribs.groupBy(col("node2"))
        .agg(sum(col("c")).as("s"))
        .select(col("node2").as("node"),
          (lit(15L * Scale / 100) + expr("(85 * s) div 100")).as("r"))
        .localCheckpoint()
    }
    ew.unpersist() // ranks is materialized by the final localCheckpoint
    ranks
  }
}
