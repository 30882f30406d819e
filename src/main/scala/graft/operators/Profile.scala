package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiler — the ANALYZE/data-quality primitive a pipeline runs
  * before trusting a new drop: per column, row count, non-null count,
  * exact distinct count, and min/max, emitted as one long-format row
  * per column.
  *
  * Scale design: each profiled column is its own single-column
  * aggregate over a COLUMN-PRUNED parquet scan (the plan reads just
  * that column's pages), then the per-column one-row aggregates union.
  * This deliberately avoids multi-`count_distinct` in a single agg —
  * Catalyst plans that as an Expand that multiplies every input row by
  * the number of distinct aggregates, turning one cheap columnar pass
  * into an N× row blowup. Numeric min/max round to 4 decimals (the
  * repo-wide float determinism convention); string min/max compare
  * lexicographically on both engines.
  */
object Profile {

  /** Profile `numCols` (numeric) and `strCols` (string) of `df`:
    * (col, n_rows, n_nonnull, n_distinct, vmin, vmax, smin, smax) —
    * vmin/vmax NULL for string columns, smin/smax NULL for numeric.
    */
  def tableProfile(df: DataFrame, numCols: Seq[String],
      strCols: Seq[String]): DataFrame = {
    def base(c: String): DataFrame = df.select(col(c))
    def numRow(c: String): DataFrame =
      base(c).agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        count_distinct(col(c)).as("n_distinct"),
        round(min(col(c)).cast("double"), 4).as("vmin"),
        round(max(col(c)).cast("double"), 4).as("vmax"),
        lit(null).cast("string").as("smin"),
        lit(null).cast("string").as("smax"))
        .select(lit(c).as("col"), col("*"))
    def strRow(c: String): DataFrame =
      base(c).agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        count_distinct(col(c)).as("n_distinct"),
        lit(null).cast("double").as("vmin"),
        lit(null).cast("double").as("vmax"),
        min(col(c)).as("smin"),
        max(col(c)).as("smax"))
        .select(lit(c).as("col"), col("*"))
    (numCols.map(numRow) ++ strCols.map(strRow))
      .reduce(_.unionAll(_))
  }
}
