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

  test("KLL: exact below k; certified rank error above; mergeable rollup") {
    import graft.operators.Kll
    import spark.implicits._
    val k = 128
    // --- exactness: n <= k means nothing ever compacts ---
    val small = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val smallSk = Kll.sketch(small, "g", "v", k)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = smallSk.select(Kll.quantile(col("sketch"), q))
        .head().getDouble(0)
      // exact lower quantile of 1..100 at ceil(q*100)
      assert(est == math.ceil(q * 100), s"q=$q est=$est")
    }
    // --- certified epsilon on a 60k skewed stream ---
    val n = 60000L
    val big = spark.range(n).select(lit("g").as("g"),
      // heavy skew: half the mass at tiny values, a long tail above
      when(col("id") % 2 === 0, col("id").cast("double") / 1e6)
        .otherwise(pow(col("id").cast("double"), 1.5)).as("v"))
    val sk = Kll.sketch(big, "g", "v", k)
    assert(sk.select(Kll.totalWeight(col("sketch"))).head().getDouble(0)
      == n.toDouble)
    val eps = Kll.epsilon(k, n)
    assert(eps < 0.2, s"bound should be non-vacuous, got $eps")
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
      val est = sk.select(Kll.quantile(col("sketch"), q))
        .head().getDouble(0)
      val rank = big.filter(col("v") <= est).count().toDouble / n
      assert(math.abs(rank - q) <= eps + 1.0 / n,
        s"q=$q est=$est rank=$rank eps=$eps")
    }
    // --- buffer is bounded: levels*k, never the stream ---
    val sizes = sk.select(flatten(col("sketch.levels"))).head()
      .getSeq[Double](0).size
    assert(sizes <= k * 16, s"sketch holds $sizes values")
    // --- rollup: per-shard sketches merged == same epsilon contract
    // (compaction arrangement differs with merge order, so rollup and
    // direct agree to the BOUND, not bit-for-bit — the bound is the
    // production contract) ---
    val sharded = Kll.sketch(
      big.withColumn("g", concat(lit("s"), col("v").cast("long") % 7)),
      "g", "v", k)
    val mergeAgg = org.apache.spark.sql.functions.udaf(
      new Kll.KllMergeAgg(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Kll.KllState]())
    // a product input encoder maps each case-class field to one
    // input column
    val rolled = sharded.select(lit("g").as("g"), col("sketch"))
      .groupBy("g")
      .agg(mergeAgg(col("sketch.levels"), col("sketch.flips"))
        .as("sketch"))
    assert(rolled.select(Kll.totalWeight(col("sketch")))
      .head().getDouble(0) == n.toDouble)
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val est = rolled.select(Kll.quantile(col("sketch"), q))
        .head().getDouble(0)
      val rank = big.filter(col("v") <= est).count().toDouble / n
      assert(math.abs(rank - q) <= eps + 1.0 / n,
        s"rollup q=$q est=$est rank=$rank eps=$eps")
    }
    // --- determinism: the same input yields the identical sketch ---
    val again = Kll.sketch(big, "g", "v", k)
      .select(Kll.quantile(col("sketch"), 0.5)).head().getDouble(0)
    assert(again == sk.select(Kll.quantile(col("sketch"), 0.5))
      .head().getDouble(0))
  }
}
