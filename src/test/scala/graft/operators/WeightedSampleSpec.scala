package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 200).map { i =>
    (i.toLong, if (i % 2 == 0) "even" else "odd", 1.0 + (i % 7))
  }.toDF("id", "grp", "w")

  test("draws exactly n per stratum (or the whole stratum if smaller)") {
    val r = Sampling.weightedSample(df, "grp", "id", col("w"), n = 10)
    val counts = r.groupBy("grp").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(counts == Map("even" -> 10L, "odd" -> 10L))
    val tiny = Sampling.weightedSample(df.filter(col("id") <= 3),
      "grp", "id", col("w"), n = 10)
    assert(tiny.count() == 3) // stratum smaller than n: keep all
  }

  test("sample is a pure function of the data: partitioning-invariant") {
    val a = Sampling.weightedSample(df.repartition(17), "grp", "id",
        col("w"), n = 15)
      .select("grp", "id", "rn").collect().map(_.toSeq).toSet
    val b = Sampling.weightedSample(df.coalesce(1), "grp", "id",
        col("w"), n = 15)
      .select("grp", "id", "rn").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("an overwhelming weight is always drawn first") {
    val skew = df.withColumn("w",
      when(col("id") === 42, lit(1e9)).otherwise(lit(1.0)))
    val r = Sampling.weightedSample(skew, "grp", "id", col("w"), n = 1)
      .filter(col("grp") === "even").head()
    assert(r.getLong(0) == 42L) // ln(u)/1e9 ~ 0- beats every unit weight
  }

  test("weighting shifts the drawn mass toward heavy rows") {
    // one stratum; weight 100 on ids <= 50, weight 1 above: a 25-draw
    // sample should be dominated by the heavy half (p_heavy ~ 99%)
    val one = (1 to 500).map(i =>
      (i.toLong, "s", if (i <= 50) 100.0 else 1.0)).toDF("id", "grp", "w")
    val drawn = Sampling.weightedSample(one, "grp", "id", col("w"), n = 25)
      .select("id").collect().map(_.getLong(0))
    val heavy = drawn.count(_ <= 50)
    assert(heavy >= 18, s"only $heavy/25 draws from the heavy half")
  }
}
