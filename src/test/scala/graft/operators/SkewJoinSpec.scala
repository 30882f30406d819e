package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("salted join equals plain join on skewed data") {
    // hot key: 900 of 1000 rows share k=1
    val large = spark.range(1000)
      .select(when(col("id") < 900, 1L).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val small = spark.createDataFrame(Seq(
      Row(1L, "hot"), Row(950L, "cold"), Row(999L, "cold2")
    ).asJava, StructType.fromDDL("k BIGINT, name STRING"))

    val plain = large.join(small, "k")
      .select("k", "v", "name").collect().map(_.toString).sorted.toSeq
    val saltedResult = SkewJoin.salted(large, small, "k", saltFactor = 8)
      .select(large("k"), col("v"), col("name"))
      .collect().map(_.toString).sorted.toSeq
    assert(saltedResult == plain)
    assert(plain.count(_.contains("hot")) == 900)
  }

  test("salt actually spreads the hot key across partitions") {
    val large = spark.range(1000).select(lit(1L).as("k"), col("id").as("v"))
    val salts = large.withColumn("__salt",
        pmod(xxhash64(col("k"), col("v")), lit(8L)))
      .select("__salt").distinct().count()
    assert(salts > 4, s"expected hot key spread over >4 salts, got $salts")
  }
}
