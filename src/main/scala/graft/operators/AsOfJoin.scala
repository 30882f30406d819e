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

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` within the same key partition (the "next
    * reading after the event" direction). Same union-plus-one-window
    * plan as [[backward]], mirrored: right rows sort AFTER left rows at
    * equal ts so the match stays inclusive, and the frame looks forward.
    *
    * `tolerance`: matches newer than `left.ts + tolerance` are nulled.
    */
  def forward(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String,
      rightValues: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(leftCols.intersect(rightValues).isEmpty,
      s"right value columns collide with left: ${leftCols.intersect(rightValues)}")

    val l = left
      .withColumn("_side", lit(0))
      .select(
        (keys.map(col) :+ col(tsCol) :+ col("_side")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col) ++
        rightValues.map(c => lit(null).as(c)): _*)
    val r = right
      .withColumn("_side", lit(1))
      .select(
        (keys.map(col) :+ col(tsCol) :+ col("_side")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => lit(null).as(c)) ++
        rightValues.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val matched = rightValues.foldLeft(l.unionByName(r)) { (df, v) =>
      df.withColumn(v, first(col(v), ignoreNulls = true).over(w))
    }
    val withTol = tolerance match {
      case None => matched
      case Some(tol) =>
        val wTs = first(when(col("_side") === 1, col(tsCol)), ignoreNulls = true).over(w)
        val fresh = wTs <= col(tsCol) + tol
        rightValues.foldLeft(matched.withColumn("_mts", wTs)) { (df, v) =>
          df.withColumn(v, when(col("_mts").isNotNull && fresh, col(v)))
        }.drop("_mts")
    }
    withTol.filter(col("_side") === 0).drop("_side")
  }

  /** Nearest as-of join: the CLOSER of the backward and forward matches
    * by |right.ts - left.ts|, ties toward the backward (past) match —
    * the sensor-alignment semantics. Carries `matchTsCol` (the matched
    * right row's ts) alongside the value columns so callers can audit
    * the distance. Two window passes over the same shuffle layout —
    * Catalyst reuses the exchange, so cost stays one shuffle + sorts.
    */
  def nearest(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String,
      rightValues: Seq[String], matchTsCol: String): DataFrame = {
    val leftKey = left.columns.toSeq // natural key of a left row
    val b = backward(
      left, right.withColumn(matchTsCol, col(tsCol)),
      keys, tsCol, rightValues :+ matchTsCol)
      .withColumnRenamed(matchTsCol, "_bts")
    val bRenamed = rightValues.foldLeft(b) { (df, v) =>
      df.withColumnRenamed(v, s"_b_$v")
    }
    val f = forward(
      left, right.withColumn(matchTsCol, col(tsCol)),
      keys, tsCol, rightValues :+ matchTsCol)
      .withColumnRenamed(matchTsCol, "_fts")
    val fRenamed = rightValues.foldLeft(f) { (df, v) =>
      df.withColumnRenamed(v, s"_f_$v")
    }
    val joined = bRenamed.join(fRenamed, leftKey)
    // cast-to-double works for both numeric and timestamp ts columns
    // (timestamps become epoch seconds, exactly representable)
    val dB = col(tsCol).cast("double") - col("_bts").cast("double")
    val dF = col("_fts").cast("double") - col(tsCol).cast("double")
    val useB = col("_fts").isNull || (col("_bts").isNotNull && dB <= dF)
    val picked = rightValues.foldLeft(joined) { (df, v) =>
      df.withColumn(v, when(useB, col(s"_b_$v")).otherwise(col(s"_f_$v")))
    }
    picked
      .withColumn(matchTsCol, when(useB, col("_bts")).otherwise(col("_fts")))
      .select(leftKey.map(col) ++ rightValues.map(col) :+ col(matchTsCol): _*)
  }
}
