package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

/** Approximate-aggregate contracts (SURVEY Q14 note): sketches must land
  * within tolerance of the exact answers they approximate.
  */
class SketchSpec extends SparkSpec {
  private lazy val events = Tables(spark, sf, "events")

  test("approx_count_distinct within 5% of exact (HLL)") {
    val r = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).collect().head
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"exact=$exact approx=$approx")
  }

  test("approx_percentile brackets the exact median") {
    val r = events.agg(
      expr("percentile(value, 0.5)").as("exact"),
      expr("approx_percentile(value, 0.5, 1000)").as("approx")).collect().head
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / math.max(math.abs(exact), 1e-9) <= 0.05,
      s"exact=$exact approx=$approx")
  }
}
