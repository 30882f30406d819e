package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvmSpec extends SparkSpec {
  import spark.implicits._

  test("delta join algebra: old + delta == from-scratch, signs multiply") {
    val aOld = Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("id", "k")
    val bOld = Seq(("x", "r1"), ("y", "r2")).toDF("k", "v")
    // A: delete id=3 (k=x), insert id=4 (k=y), insert id=5 (k=z)
    val dA = Seq((3L, "x", -1L), (4L, "y", 1L), (5L, "z", 1L))
      .toDF("id", "k", "_sign")
    // B: delete (y, r2), insert (y, r9), insert (z, r3)
    val dB = Seq(("y", "r2", -1L), ("y", "r9", 1L), ("z", "r3", 1L))
      .toDF("k", "v", "_sign")
    val aNew = Seq((1L, "x"), (2L, "y"), (4L, "y"), (5L, "z"))
      .toDF("id", "k")
    val bNew = Seq(("x", "r1"), ("y", "r9"), ("z", "r3")).toDF("k", "v")

    def counted(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("id"), col("k"), col("v"))
        .agg(sum(col("_sign")).as("m"))
    val incremental = counted(
      Ivm.deltaJoin(aOld, dA, bOld, dB, Seq("k"))
        .unionByName(aOld.join(bOld, Seq("k")).withColumn("_sign", lit(1L))))
      .filter(col("m") =!= 0L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    val scratch = aNew.join(bNew, Seq("k"))
      .select(col("id"), col("k"), col("v"), lit(1L).as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(incremental == scratch,
      s"incremental $incremental != from-scratch $scratch")
  }

  test("signedFeed maps the four change types to ±1") {
    val cdf = Seq(
      (1L, "insert", 5L), (2L, "delete", 5L),
      (3L, "update_preimage", 6L), (4L, "update_postimage", 6L))
      .toDF("id", "_change_type", "_commit_version")
    val signs = Ivm.signedFeed(cdf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(signs == Map(1L -> 1L, 2L -> -1L, 3L -> -1L, 4L -> 1L))
  }
}
