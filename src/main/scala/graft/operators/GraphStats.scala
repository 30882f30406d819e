package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph summary statistics computed in single passes — the
  * cheap structural probes run before committing to an iterative
  * algorithm over a 100 TB edge list.
  */
object GraphStats {

  /** Degree assortativity (Newman's r): the Pearson correlation of
    * endpoint degrees over the directed edge list. Positive r — hubs
    * connect to hubs; negative — hubs connect to leaves. Pass a
    * symmetrized edge list for the undirected reading.
    *
    * Output: one row (m, assortativity) where m = |edges|.
    *
    * All sufficient statistics (Σx, Σy, Σxy, Σx², Σy², m) are EXACT
    * BIGINT sums — aggregation-order independent, partial-aggregated
    * map-side — and only the final scalar formula runs in double, so a
    * cross-engine oracle re-executes it bit-identically. Cost: one
    * degree groupBy + two (edge ⨝ degree) equi-joins + one combinable
    * aggregate — a single pass at any scale, no iteration.
    */
  def assortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val deg = edges.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("deg"))
    val xy = edges
      .join(deg.select(col("node").as(srcCol), col("deg").as("x")), srcCol)
      .join(deg.select(col("node").as(dstCol), col("deg").as("y")), dstCol)
    xy.agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("y") * col("y")).as("sy2"))
      .select(col("m"),
        round((col("m").cast("double") * col("sxy") -
            col("sx").cast("double") * col("sy")) /
          (sqrt(col("m").cast("double") * col("sx2") -
            col("sx").cast("double") * col("sx")) *
           sqrt(col("m").cast("double") * col("sy2") -
            col("sy").cast("double") * col("sy"))), 4)
          .as("assortativity"))
  }
}
