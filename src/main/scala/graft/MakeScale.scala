package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off sf-up-scaler for confidence runs past the driver-generated
  * scales: replicates every sf0.1 table `mult`× into an output dir with
  * CONSISTENT key offsets (an order's replica joins its own customer's
  * replica, a lineitem its own order/part/supplier), so join-heavy
  * queries exercise real multiplied cardinalities, not key mismatches.
  * sf0.1 × 10 ≈ sf1. Usage:
  *
  *   sbt "runMain graft.MakeScale 10 /tmp/sf1"
  *
  * Verify + the DuckDB oracle then run against the output dir exactly
  * like a driver-generated scale (golden-pinned hash queries excepted —
  * no golden parquet exists for synthetic scales).
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val out = if (args.length > 1) args(1) else "/tmp/sf1"
    val base = "/root/testdata/sf0.1"
    val spark = graft.engine.Sessions.local("graft-makescale", "32")

    def tbl(n: String): DataFrame = graft.engine.Tables(spark, base, n)

    /** Max+1 per key column so replica id spaces are disjoint. */
    def span(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1

    val custSpan = span(tbl("customer"), "c_custkey")
    val suppSpan = span(tbl("supplier"), "s_suppkey")
    val partSpan = span(tbl("part"), "p_partkey")
    val ordSpan  = span(tbl("orders"), "o_orderkey")

    /** Replicate with per-column offsets (cols not listed pass through;
      * column order preserved).
      */
    def rep(name: String, offsets: Map[String, Long],
        textSalt: Option[String] = None): Unit = {
      val t = tbl(name)
      val outCols = t.columns.toSeq.map { c =>
        offsets.get(c) match {
          case Some(s) => (col(c) + col("__rep") * s).as(c)
          case None => textSalt match {
            case Some(tc) if tc == c =>
              // suffix per replica: keeps intra-replica dup structure,
              // no cross-replica exact dups
              concat(col(c), lit(" r"), col("__rep")).as(c)
            case _ => col(c)
          }
        }
      }
      spark.range(mult).withColumnRenamed("id", "__rep")
        .crossJoin(t)
        .select(outCols: _*)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[makescale] $name x$mult -> $out")
    }

    // dimension tables shared by every replica: copy verbatim
    Seq("region", "nation").foreach { n =>
      tbl(n).write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[makescale] $n copied")
    }

    rep("customer", Map("c_custkey" -> custSpan))
    rep("supplier", Map("s_suppkey" -> suppSpan))
    rep("part", Map("p_partkey" -> partSpan))
    rep("orders", Map("o_orderkey" -> ordSpan, "o_custkey" -> custSpan))
    rep("lineitem", Map("l_orderkey" -> ordSpan, "l_partkey" -> partSpan,
      "l_suppkey" -> suppSpan))
    rep("events", Map("event_id" -> span(tbl("events"), "event_id"),
      "user_id" -> span(tbl("events"), "user_id")))
    rep("documents", Map("doc_id" -> span(tbl("documents"), "doc_id")),
      textSalt = Some("text"))
    rep("embeddings", Map("vec_id" -> span(tbl("embeddings"), "vec_id")))

    spark.stop()
  }
}
