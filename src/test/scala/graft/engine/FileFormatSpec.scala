package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** File-format coverage (SURVEY §2.2 "File formats / connectors"):
  * the same relation read back from JSON and CSV must answer the same
  * aggregation as the parquet original.
  */
class FileFormatSpec extends SparkSpec {
  test("json and csv round-trip the orders aggregation") {
    val orders = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val expected = orders.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("c"), round(sum("o_totalprice"), 2).as("s"))
      .orderBy("o_orderstatus").collect().map(_.toString).toSeq

    val dir = java.nio.file.Files.createTempDirectory("fmt").toString
    orders.write.mode("overwrite").json(s"$dir/json")
    orders.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")

    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("c"), round(sum("o_totalprice"), 2).as("s"))
      .orderBy("o_orderstatus").collect().map(_.toString).toSeq

    assert(agg(spark.read.json(s"$dir/json")) == expected)
    assert(agg(spark.read.option("header", "true")
      .schema(orders.schema).csv(s"$dir/csv")) == expected)
  }
}
