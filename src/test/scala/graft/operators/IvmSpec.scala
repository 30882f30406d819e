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

  test("maintainExtreme: group-selective refresh, clean groups never touch the snapshot") {
    // old view: a->10, b->20, c->5
    val view = Seq(("a", 10L), ("b", 20L), ("c", 5L)).toDF("k", "len")
    // feed: insert a:15 (new max, no delete); delete b:20 (the max
    // itself); delete ALL of c; insert d:7 (brand-new group)
    val feed = Seq(
      ("insert", "a", 15L), ("delete", "b", 20L),
      ("delete", "c", 5L), ("insert", "d", 7L))
      .toDF("_change_type", "k", "len")
    // the new snapshot RESTRICTED to delete-touched groups only — a
    // clean-group implementation bug (consulting the snapshot for
    // group a) would produce a wrong answer here, which is the point
    val snapTouchedOnly = Seq(("b", 12L), ("b", 3L)).toDF("k", "len")
    val got = Ivm.maintainExtreme(view, feed, snapTouchedOnly, "k", "len")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 15L, "b" -> 12L, "d" -> 7L),
      s"got $got") // c vanished (all rows deleted)
    // MIN variant: an insert below the old min wins without a rescan
    val gotMin = Ivm.maintainExtreme(
      Seq(("a", 10L)).toDF("k", "len"),
      Seq(("insert", "a", 4L)).toDF("_change_type", "k", "len"),
      Seq.empty[(String, Long)].toDF("k", "len"),
      "k", "len", maxAgg = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotMin == Map("a" -> 4L))
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
