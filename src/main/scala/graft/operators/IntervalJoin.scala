package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unkeyed interval join: match each left row (point `ts`) to right
  * rows whose `[start, end]` interval contains it, WITHOUT an equi-key.
  *
  * Naive Spark planning for `l.ts BETWEEN r.start AND r.end` is a
  * BroadcastNestedLoopJoin — O(|L|·|R|), the classic scale cliff. This
  * operator converts it to an equi-join by time bucketing: left rows
  * get one bucket (`ts div W`), right intervals explode over the
  * buckets they span (`start div W .. end div W`), the join runs on
  * the bucket key, and the exact predicate filters residuals. Each
  * matching pair meets in exactly one bucket (the left row's), so no
  * dedup is needed. Choose `bucketWidth` ≈ median interval length so
  * intervals explode to O(1) buckets.
  */
object IntervalJoin {

  /** All columns of both sides for matching pairs. Timestamps are
    * compared as epoch seconds (`unix_timestamp`-style long columns).
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
      leftTsSec: String, rightStartSec: String, rightEndSec: String,
      bucketWidthSec: Long): DataFrame = {
    val lb = left.withColumn("__bkt", col(leftTsSec) / bucketWidthSec cast "long")
    val rb = right.withColumn("__bkt", explode(sequence(
      (col(rightStartSec) / bucketWidthSec).cast("long"),
      (col(rightEndSec) / bucketWidthSec).cast("long"))))
    lb.join(rb, Seq("__bkt"))
      .filter(col(leftTsSec) >= col(rightStartSec) &&
        col(leftTsSec) <= col(rightEndSec))
      .drop("__bkt")
  }
}
