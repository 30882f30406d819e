package graft.engine

import org.apache.spark.sql.DataFrame

/** Adaptive parallelism widening for operators whose per-row work is
  * much heavier than their input bytes (shingling, hashing, scoring):
  * a small parquet file arrives as 1-2 partitions, which would serialize
  * the whole operator on one core.
  *
  * `widen` repartitions ONLY when the input is narrower than the
  * cluster's parallelism — at real scale (file splits >> cores) it is a
  * no-op, so it never adds a shuffle to the 100 TB plan; round-robin
  * (not keyed) because the caller's next op re-shuffles by its own key
  * anyway.
  */
object Par {
  /** Partition count read off the EXECUTED plan's output partitioning —
    * `df.rdd` would force a second, throwaway physical planning of the
    * whole query (and an RDD conversion) just to ask this question.
    */
  private def planPartitions(df: DataFrame): Int =
    df.queryExecution.executedPlan.outputPartitioning.numPartitions

  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (planPartitions(df) < target) df.repartition(target) else df
  }
}
