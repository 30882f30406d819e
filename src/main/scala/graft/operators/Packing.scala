package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: assign documents to
  * fixed-token-budget bins. This is the *offset-chunking* formulation —
  * bin = floor(running-token-offset / budget) over a total document
  * order — which is closed-form (one window cumsum, no iteration),
  * deterministic under any partitioning, and what a token-offset
  * sharded dataloader actually consumes. (True greedy first-fit packing
  * is inherently sequential; offset chunking is the parallelizable
  * industry-standard approximation.)
  *
  * Scale note: the global cumsum is a range-partitioned sort — at
  * 100 TB, Spark's range partitioner handles the global order; bins are
  * then written with `partitionBy("bin")` or bucketed by bin.
  */
object Packing {
  /** Adds (token_offset, bin) per document, ordered by `idCol`. */
  def byTokenOffset(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    docs
      .withColumn("token_offset",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("token_offset") / budget))
  }

  /** Per-bin stats: docs, tokens (the shard manifest). */
  def binManifest(packed: DataFrame, tokensCol: String): DataFrame =
    packed.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("n_tokens"))
}
