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

  test("rolling distinct via mergeable HLL sketches tracks q136's exact WAU") {
    // the 100 TB path for q136: ONE Datasketches HLL per (day) —
    // map-side combinable, |days| rows of state — then each trailing
    // window is a UNION of 7 already-built sketches (hll_union_agg).
    // The event stream is aggregated once; windows never re-scan it.
    // Contract: ≤5% of the exact explode-based answer on every day.
    val exact = graft.SparkEntry.queries("q136_rolling_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val daily = events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val days = daily.select(col("day").as("day2"))
    val approx = daily
      .withColumn("o", explode(sequence(lit(0), lit(6))))
      .select(date_add(col("day"), col("o")).as("day2"), col("sk"))
      .join(days.distinct(), "day2")
      .groupBy(col("day2"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("wau"))
      .select(date_format(col("day2"), "yyyy-MM-dd").as("day"), col("wau"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (day, ex) =>
      val ap = approx(day).toDouble
      assert(math.abs(ap - ex) / ex <= 0.05, s"$day exact=$ex approx=$ap")
    }
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
