package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the most recent right row
  * with `right.ts <= left.ts` within the same key partition — the
  * operator Spark SQL lacks natively (SURVEY §2.2 / §4.2).
  *
  * Plan shape (the scale-correct rewrite, no range-explosion and no
  * BroadcastNestedLoopJoin): union both sides tagged with a side flag,
  * then one window pass `last(value, ignoreNulls)` ordered by
  * (ts, side) per key. Cost = one shuffle on the key + one sort —
  * linear in |left| + |right|, the same plan a dedicated as-of physical
  * operator would produce. Right rows sort before left rows at equal
  * ts, so the match is inclusive (ts_right == ts_left matches).
  *
  * `tolerance`: optional max staleness — matches older than
  * `left.ts - tolerance` are nulled out.
  */
object AsOfJoin {

  /** @param rightValues right-side columns to carry (joined output gets
    *                    them as-is; nulls where no match)
    */
  def backward(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String,
      rightValues: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(leftCols.intersect(rightValues).isEmpty,
      s"right value columns collide with left: ${leftCols.intersect(rightValues)}")

    val l = left
      .withColumn("_side", lit(1))
      .select(
        (keys.map(col) :+ col(tsCol) :+ col("_side")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col) ++
        rightValues.map(c => lit(null).as(c)): _*)
    val r = right
      .withColumn("_side", lit(0))
      .select(
        (keys.map(col) :+ col(tsCol) :+ col("_side")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => lit(null).as(c)) ++
        rightValues.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = rightValues.foldLeft(l.unionByName(r)) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    val withTol = tolerance match {
      case None => matched
      case Some(tol) =>
        val wTs = last(when(col("_side") === 0, col(tsCol)), ignoreNulls = true).over(w)
        val fresh = wTs >= col(tsCol) - tol
        rightValues.foldLeft(matched.withColumn("_mts", wTs)) { (df, v) =>
          df.withColumn(v, when(col("_mts").isNotNull && fresh, col(v)))
        }.drop("_mts")
    }
    withTol.filter(col("_side") === 1).drop("_side")
  }
}
