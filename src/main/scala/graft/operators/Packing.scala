package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for LLM training data: assign documents to
  * fixed-token-budget bins. This is the *offset-chunking* formulation —
  * bin = floor(running-token-offset / budget) over a total document
  * order — which is deterministic under any partitioning and what a
  * token-offset sharded dataloader actually consumes. (True greedy
  * first-fit packing is inherently sequential; offset chunking is the
  * parallelizable industry-standard approximation.)
  *
  * Scale design: a global window cumsum (`Window.orderBy` with no
  * PARTITION BY) would move the whole corpus into ONE task — Spark even
  * warns (`WindowExec: No Partition Defined`). Instead this runs the
  * classic distributed prefix sum: range-partition by id, job 1 reduces
  * each partition to a single token total (numPartitions longs to the
  * driver), the driver takes the exclusive prefix over that tiny array,
  * and job 2 streams each partition once adding its base offset. Two
  * narrow passes, no single-partition stage, O(numPartitions) driver
  * state — this survives 100 TB.
  */
object Packing {
  /** Adds (token_offset, bin) per document, ordered by `idCol`. */
  def byTokenOffset(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    val spark = docs.sparkSession
    val ranged = docs
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
    val schema = ranged.schema
    val tokIdx = schema.fieldIndex(tokensCol)
    // ONE RDD instance reused by both jobs: job 1 materializes the range
    // shuffle, job 2 skips straight to its output — so the partition ->
    // id-range mapping is identical across the two passes.
    val rdd = ranged.rdd
    val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += asLong(r, tokIdx))
      Iterator.single((pid, s))
    }.collect().toMap
    val nParts = rdd.getNumPartitions
    val base = new Array[Long](nParts)
    var acc = 0L
    var p = 0
    while (p < nParts) { base(p) = acc; acc += totals.getOrElse(p, 0L); p += 1 }
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var off = base(pid)
      it.map { r =>
        val row = Row.fromSeq(r.toSeq :+ off :+ (off / budget))
        off += asLong(r, tokIdx)
        row
      }
    }
    spark.createDataFrame(out,
      schema.add("token_offset", LongType, nullable = false)
        .add("bin", LongType, nullable = false))
  }

  private def asLong(r: Row, i: Int): Long = r.get(i) match {
    case null => 0L
    case n: java.lang.Number => n.longValue()
  }

  /** Per-bin stats: docs, tokens (the shard manifest). */
  def binManifest(packed: DataFrame, tokensCol: String): DataFrame =
    packed.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("n_tokens"))
}
