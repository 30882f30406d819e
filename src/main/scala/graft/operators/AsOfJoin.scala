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

    val u = l.unionByName(r)
    val matched = tolerance match {
      case None =>
        rightValues.foldLeft(u) { (df, v) =>
          df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
        }
      case Some(tol) =>
        // freshness must gate on the ts of the row that SUPPLIED the
        // value: a null v on the nearest right row must not let a
        // farther row's value pass the staleness check — so each value
        // column carries its own (ts, v) pair through the window
        rightValues.foldLeft(u) { (df, v) =>
          val pair = last(
            when(col("_side") === 0 && col(v).isNotNull,
              struct(col(tsCol).as("_t"), col(v).as("_v"))),
            ignoreNulls = true).over(w)
          df.withColumn("_p", pair)
            .withColumn(v,
              when(col("_p").isNotNull &&
                col("_p._t") >= col(tsCol) - tol, col("_p._v")))
            .drop("_p")
        }
    }
    matched.filter(col("_side") === 1).drop("_side")
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

    val u = l.unionByName(r)
    val matched = tolerance match {
      case None =>
        rightValues.foldLeft(u) { (df, v) =>
          df.withColumn(v, first(col(v), ignoreNulls = true).over(w))
        }
      case Some(tol) =>
        // per-value (ts, v) pair — see backward(): the staleness gate
        // must use the supplying row's ts, not the nearest row's
        rightValues.foldLeft(u) { (df, v) =>
          val pair = first(
            when(col("_side") === 1 && col(v).isNotNull,
              struct(col(tsCol).as("_t"), col(v).as("_v"))),
            ignoreNulls = true).over(w)
          df.withColumn("_p", pair)
            .withColumn(v,
              when(col("_p").isNotNull &&
                col("_p._t") <= col(tsCol) + tol, col("_p._v")))
            .drop("_p")
        }
    }
    matched.filter(col("_side") === 0).drop("_side")
  }

  /** Nearest as-of join: the CLOSER of the backward and forward matches
    * by |right.ts - left.ts|, ties toward the backward (past) match —
    * the sensor-alignment semantics. Carries `matchTsCol` (the matched
    * right row's ts) alongside the value columns so callers can audit
    * the distance.
    *
    * Plan shape: ONE union of both sides, then both directions as
    * RANGE-frame window passes over the SAME (key, ts) sort — the range
    * boundaries make equal-ts right rows visible to both directions
    * regardless of peer order, and Catalyst reuses the single exchange
    * and sort across the two frames. Cost = one shuffle, linear in
    * |left| + |right| (the naive backward ⋈ forward rewrite pays three
    * shuffles). Right rows should be unique per (keys, ts) — dedupe
    * first, as ties between right peers at the same ts are otherwise
    * positional.
    */
  def nearest(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String,
      rightValues: Seq[String], matchTsCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    require(leftCols.intersect(rightValues :+ matchTsCol).isEmpty,
      "right value / match-ts columns collide with left")

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

    // exact numeric ordering key: timestamps via unix_micros (a long —
    // a double cast would collapse distinct values past 2^53, e.g. raw
    // nanosecond-epoch BIGINT columns), numeric columns used as-is
    val tsNum: Column = left.schema(tsCol).dataType match {
      case _: org.apache.spark.sql.types.TimestampType =>
        unix_micros(col(tsCol))
      case _ => col(tsCol)
    }
    val u = l.unionByName(r).withColumn("_tsn", tsNum)
    val wB = Window.partitionBy(keys.map(col): _*).orderBy(col("_tsn"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*).orderBy(col("_tsn"))
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    def rightOnly(c: Column): Column = when(col("_side") === 0, c)

    val both = rightValues.foldLeft(
      u.withColumn("_bts", last(rightOnly(col(tsCol)), ignoreNulls = true).over(wB))
        .withColumn("_btsn", last(rightOnly(col("_tsn")), ignoreNulls = true).over(wB))
        .withColumn("_fts", first(rightOnly(col(tsCol)), ignoreNulls = true).over(wF))
        .withColumn("_ftsn", first(rightOnly(col("_tsn")), ignoreNulls = true).over(wF))) {
      (df, v) =>
        df.withColumn(s"_b_$v", last(rightOnly(col(v)), ignoreNulls = true).over(wB))
          .withColumn(s"_f_$v", first(rightOnly(col(v)), ignoreNulls = true).over(wF))
    }
    // exact integer distances (the _tsn twins of _bts/_fts pick the
    // same positional rows, so the pairs are consistent)
    val dB = col("_tsn") - col("_btsn")
    val dF = col("_ftsn") - col("_tsn")
    val useB = col("_fts").isNull || (col("_bts").isNotNull && dB <= dF)
    val picked = rightValues.foldLeft(both) { (df, v) =>
      df.withColumn(v, when(useB, col(s"_b_$v")).otherwise(col(s"_f_$v")))
    }
    picked
      .filter(col("_side") === 1)
      .withColumn(matchTsCol, when(useB, col("_bts")).otherwise(col("_fts")))
      .select(leftCols.map(col) ++ rightValues.map(col) :+ col(matchTsCol): _*)
  }
}
