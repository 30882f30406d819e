package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class TopKAggregatorSpec extends SparkSpec {
  test("matches the window row_number formulation on real data") {
    val c = Tables(spark, sf, "customer")
      .select(col("c_nationkey").cast("long").as("grp"),
        col("c_custkey").as("id"), col("c_acctbal").as("score"))
    val viaAgg = TopKAggregator.topKPerGroup(
        c.toDF(), "grp", "id", "score", k = 3)
      .select("grp", "id", "rn")
      .collect().map(_.toString).sorted.toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("score").desc, col("id"))
    val viaWindow = c.withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 3).select("grp", "id", "rn")
      .collect().map(_.toString).sorted.toSeq
    assert(viaAgg == viaWindow)
  }

  test("partial aggregation appears in the plan (map-side top-k)") {
    val c = Tables(spark, sf, "customer")
      .select(col("c_nationkey").cast("long").as("grp"),
        col("c_custkey").as("id"), col("c_acctbal").as("score"))
    val plan = TopKAggregator.topKPerGroup(c.toDF(), "grp", "id", "score", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate"), plan)
    assert(plan.split("ObjectHashAggregate|SortAggregate|HashAggregate").length >= 3,
      "expect partial + final aggregation pair\n" + plan)
  }
}
