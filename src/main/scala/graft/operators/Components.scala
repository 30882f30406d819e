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
  * Algorithm: min-label propagation with POINTER DOUBLING. Every node
  * starts labeled with its own id; each round every node takes the min
  * of (its label, its neighbors' labels, its label's label). The last
  * term is the pointer-doubling shortcut: the distance a min label has
  * travelled doubles each round, so a chain of diameter D converges in
  * O(log D) rounds instead of O(D) — min-label alone would silently
  * need `maxIters` ~ D (the adversarial case for dup graphs is long
  * similarity chains). Labels stay inside the component throughout
  * (initial label = own id; neighbor labels are component-internal;
  * label-of-label therefore too), and at the fixpoint labels are
  * constant along every edge, i.e. each component carries exactly its
  * min id.
  *
  * Each round is two equi-joins + a partial-aggregatable min — no
  * driver-side graph state. The convergence check rides the SAME job
  * as the round's materialization via `observe()` (an accumulator-
  * backed count of changed labels) — no extra per-round action.
  * a per-round lineage cut ([[graft.engine.Checkpoints]]) truncates the plan so round i does not
  * recompute rounds 1..i-1. Non-convergence within `maxIters` (only
  * possible for diameter > 2^maxIters) logs a WARNING rather than
  * returning silently-split components.
  */
object Components extends org.apache.spark.internal.Logging {

  /** (id, comp) for every node incident to an edge; comp = min node id
    * reachable in the undirected closure.
    */
  /** Incremental connected components: fold DELTA edges into a prior
    * (id, comp) labeling without re-exploring the base graph's
    * structure — each prior component collapses to one (id — comp)
    * star, so the fixed point only walks the delta's connectivity plus
    * |V| collapsed edges, never the original |E|. Labels stay min-id
    * (prior comp ids are member ids), so the result is IDENTICAL to a
    * full recompute over base ∪ delta — the living-graph maintenance
    * loop for a continuously-ingested dedup clustering.
    */
  def incremental(prior: DataFrame, deltaEdges: DataFrame,
      aCol: String, bCol: String, maxIters: Int = 20): DataFrame =
    connectedComponents(
      prior.select(col("id").as(aCol), col("comp").as(bCol))
        .unionByName(deltaEdges.select(col(aCol), col(bCol))),
      aCol, bCol, maxIters)

  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20): DataFrame = {
    val sym = edges
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .transform(graft.engine.Checkpoints.cut)
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .transform(graft.engine.Checkpoints.cut)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .groupBy(col("src"))
        .agg(min(col("comp")).as("ncomp"))
        .select(col("src").as("id"), col("ncomp"))
      val propagated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          col("comp").as("_old"))
      // pointer doubling: follow my label to ITS label (left join — the
      // label is always a live node id, but never drop a row on a miss).
      // Round 1 skips it: labels are the identity (comp == id), so
      // label-of-label is provably comp itself — one fewer |V| join.
      val doubled =
        if (i == 0) propagated
        else propagated
          .join(labels.select(col("id").as("_pid"), col("comp").as("_pcomp")),
            col("comp") === col("_pid"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("_pcomp"), col("comp")))
              .as("comp"),
            col("_old"))
      val obs = new org.apache.spark.sql.Observation(s"cc_round_$i")
      val next = doubled
        .observe(obs, sum(when(col("comp") =!= col("_old"), 1L)
          .otherwise(0L)).as("changed"))
        .select(col("id"), col("comp"))
        .transform(graft.engine.Checkpoints.cut) // the round's single action
      graft.engine.Checkpoints.release(labels) // round N-1 label blocks
      labels = next
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      i += 1
    }
    if (!converged) logWarning(
      s"connectedComponents did not converge in $maxIters rounds " +
        "(graph diameter exceeds 2^maxIters); labels may split components")
    labels
  }

  /** Per-component sizes (the duplicate-cluster manifest). */
  def componentSizes(components: DataFrame): DataFrame =
    components.groupBy(col("comp")).agg(count(lit(1)).as("n_members"))
}
