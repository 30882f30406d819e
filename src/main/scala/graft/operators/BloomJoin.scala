package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned equi-join: build a Bloom filter over the small
  * side's join keys, prune the big side BEFORE its shuffle, then run
  * the exact join. The result is row-identical to the plain join
  * (Bloom false positives pass the prune but fail the exact join); the
  * win is that the big side's non-matching rows never enter the
  * exchange — at a 100 TB fact table joined to a selective dimension,
  * the shuffle shrinks by the selectivity factor.
  *
  * This is the manual form of Spark's runtime row-level filtering,
  * applicable where the optimizer can't inject it (checkpointed
  * inputs, non-adjacent stages, DSv2 sources without runtime-filter
  * pushdown). The filter itself is a few MB riding the plan as a
  * literal — same pattern as [[Dedup.decontaminateBloom]].
  */
object BloomJoin {

  /** Inner equi-join `big ⋈ small ON big(bigKey) = small(smallKey)`
    * with Bloom pre-pruning of `big`. Key comparison is exact; the
    * Bloom probe runs on xxhash64 of the key, so any key type works.
    */
  def prunedInner(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType

    val keys = small.select(xxhash64(col(smallKey)).as("kh")).distinct()
    val est = math.min(4000000L, math.max(1L, keys.count()))
    val bits = math.min(67108864L,
      math.max(64L, math.ceil(-est * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong))
    val bloomRow = keys
      .agg(column(new BloomFilterAggregate(expression(col("kh")),
        Literal(est), Literal(bits)).toAggregateExpression()).as("bf"))
      .head()
    if (bloomRow.isNullAt(0)) {
      // empty small side: the inner join is empty
      big.join(small, big(bigKey) === small(smallKey)).filter(lit(false))
    } else {
      val bloom = bloomRow.getAs[Array[Byte]](0)
      val pruned = big.filter(
        column(BloomFilterMightContain(Literal(bloom, BinaryType),
          expression(xxhash64(col(bigKey))))))
      pruned.join(small, pruned(bigKey) === small(smallKey))
    }
  }
}
