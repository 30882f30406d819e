package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round k-core peeling over an undirected (symmetrized) edge
  * list: each round drops every node whose CURRENT degree is below `k`,
  * then removes the edges touching dropped nodes. Run to convergence
  * this yields the classic k-core (the maximal subgraph where every
  * node keeps ≥ k neighbors — the standard graph-density filter for
  * community cores and spam farms); a FIXED round count keeps the
  * result a pure function of (edges, k, rounds), so the iterations
  * unroll to an exact SQL oracle — the same declared-iteration
  * determinism contract as [[PageRank]] and BFS.
  *
  * Scale shape per round: one map-side-combinable `groupBy(src)` for
  * degrees, then two semi-joins against the ≤|V|-row survivor set. The
  * edge list is hash-partitioned on `src` once; the degree aggregation
  * and the src-side semi-join reuse that layout every round, so only
  * the dst-side semi-join shuffles — and it shuffles a relation that
  * only ever SHRINKS (peeling never adds edges back). Lineage is cut
  * per round through [[graft.engine.Checkpoints]] (localCheckpoint, or
  * reliable `checkpoint()` under `graft.checkpoint.dir` on a cluster).
  */
object KCore {

  /** @param edges  symmetric deduplicated edge list (src: long,
    *               dst: long) — each undirected edge present in both
    *               directions, so `groupBy(src).count` IS the degree.
    * @param k      minimum degree to survive a peel.
    * @param rounds number of peeling rounds (fixed, for determinism —
    *               callers wanting the true k-core pick rounds ≥ the
    *               peeling depth, which is ≤ the graph diameter).
    * @return survivors after `rounds` peels: (node, deg) with deg the
    *         residual degree inside the surviving subgraph.
    */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    var e = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .repartition(col("src"))
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("kn"))
      e = graft.engine.Checkpoints.cut(
        e.join(keep, col("src") === col("kn"), "left_semi")
          .join(keep, col("dst") === col("kn"), "left_semi"))
    }
    e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
  }
}
