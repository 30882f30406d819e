package graft.engine

import org.apache.spark.sql.DataFrame

/** Adaptive parallelism widening for operators whose per-row work is
  * much heavier than their input bytes (shingling, hashing, scoring):
  * a small parquet file arrives as 1-2 partitions, which would serialize
  * the whole operator on one core.
  *
  * `widen` repartitions ONLY when the input is smaller than the
  * cluster's parallelism × files.maxPartitionBytes — i.e. when the scan
  * cannot possibly have produced `defaultParallelism` splits. At real
  * scale (file bytes >> cores × split size) it is a no-op, so it never
  * adds a shuffle to the 100 TB plan; round-robin (not keyed) because
  * the caller's next op re-shuffles by its own key anyway.
  *
  * The decision reads the optimizer's byte statistics (actual file
  * sizes for relations) — NOT `df.rdd`/`executedPlan`, which force a
  * throwaway physical planning, and NOT `outputPartitioning`, which is
  * `UnknownPartitioning(0)` under AQE for every unexecuted plan.
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxPartitionBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val sizeInBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (sizeInBytes < BigInt(maxPartitionBytes) * target) df.repartition(target)
    else df
  }
}
