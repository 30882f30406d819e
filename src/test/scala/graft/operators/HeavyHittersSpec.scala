package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {

  private def exact(df: org.apache.spark.sql.DataFrame, frac: Double) = {
    val n = df.count()
    df.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n * frac)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("output equals the exact HAVING query on a zipf-ish stream") {
    import spark.implicits._
    // key i appears ~1000/i times: a handful of hitters, a long tail
    val rows = (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"k$i"))
    val df = rows.toDF("k")
    val got = HeavyHitters.exactOverThreshold(df, "k", 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact(df, 0.02), s"got=$got")
    assert(got.nonEmpty && got.size < 20, s"threshold sanity: $got")
  }

  test("result is identical under any partitioning (candidates may differ; answer may not)") {
    import spark.implicits._
    val rows = (1 to 500).flatMap(i => Seq.fill(2000 / i)(s"w$i"))
    def run(parts: Int) =
      HeavyHitters.exactOverThreshold(
        rows.toDF("k").repartition(parts), "k", 0.01)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(run(1) == run(23))
  }

  test("grouped hitters equal the per-group exact HAVING query") {
    import spark.implicits._
    // group A: zipf-ish; group B: uniform (no hitters above 5%)
    val rows = (1 to 60).flatMap(i => Seq.fill(300 / i)("A" -> s"k$i")) ++
      (1 to 50).flatMap(i => Seq.fill(10)("B" -> s"k$i"))
    val df = rows.toDF("g", "k")
    val got = HeavyHitters.exactOverThresholdByGroup(df, "g", "k", 0.05)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = {
      val totals = rows.groupBy(_._1).view.mapValues(_.size).toMap
      rows.groupBy(identity).view.mapValues(_.size)
        .filter { case ((g, _), c) => c > totals(g) * 0.05 }
        .map { case ((g, k), c) => (g, k) -> c.toLong }.toMap
    }
    assert(got == want)
    assert(got.keys.forall(_._1 == "A")) // uniform group has no hitters
    // partitioning invariance (candidate sets may differ; answer may not)
    val got2 = HeavyHitters.exactOverThresholdByGroup(
        df.repartition(13), "g", "k", 0.05)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got2 == got)
  }

  test("adversarial: huge distinct tail cannot evict a true hitter") {
    import spark.implicits._
    // one key at 6% of the stream buried in 19k near-distinct keys;
    // MG guarantee: survives any decrement schedule at cap >= 19
    val hitters = Seq.fill(1200)("hot")
    val tail = (1 to 19000).map(i => s"t$i")
    val df = (hitters ++ tail).toDF("k").repartition(13)
    val got = HeavyHitters.exactOverThreshold(df, "k", 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 1200L), got.toString)
  }
}
