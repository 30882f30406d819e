package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the
  * dedup-clustering primitive: near-dup PAIRS (from
  * [[Dedup.jaccardPairs]] / [[Dedup.minHashPairs]] /
  * [[Dedup.simHashPairs]] / [[Dedup.embeddingPairsLsh]]) become
  * duplicate CLUSTERS, and a pipeline keeps one representative (the
  * min id) per component — transitive closure, where pairwise
  * keep-lowest alone over-removes on chains.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round every node takes the min of its
  * own and its neighbors' labels; stop when no label changes. Each
  * round is one equi-join + partial-aggregatable min — no driver-side
  * graph state, O(diameter) rounds. Near-dup graphs are unions of
  * near-cliques (tiny diameter), so convergence is a handful of
  * rounds; `maxIters` bounds pathological chains. `localCheckpoint`
  * per round truncates lineage so round i does not recompute rounds
  * 1..i-1.
  */
object Components {

  /** (id, comp) for every node incident to an edge; comp = min node id
    * reachable in the undirected closure.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20): DataFrame = {
    val sym = edges
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .groupBy(col("src"))
        .agg(min(col("comp")).as("ncomp"))
        .select(col("src").as("id"), col("ncomp"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      val changed = updated
        .join(labels.select(col("id"), col("comp").as("_old")), "id")
        .filter(col("comp") =!= col("_old")).count()
      labels = updated
      converged = changed == 0
      i += 1
    }
    labels
  }

  /** Per-component sizes (the duplicate-cluster manifest). */
  def componentSizes(components: DataFrame): DataFrame =
    components.groupBy(col("comp")).agg(count(lit(1)).as("n_members"))
}
