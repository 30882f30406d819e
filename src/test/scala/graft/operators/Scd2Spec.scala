package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // dim: k1 current 'a' since 10 (plus closed history row), k2 current
  // 'b' since 20, k3 current 'c' since 30
  private lazy val dim = Seq(
    ("k1", "z", 1L, Some(10L)),
    ("k1", "a", 10L, None),
    ("k2", "b", 20L, None),
    ("k3", "c", 30L, None)
  ).toDF("k", "attr", "valid_from", "valid_to")
    .withColumn("valid_to", col("valid_to").cast("long"))

  private def merged(updates: org.apache.spark.sql.DataFrame) =
    Scd2.merge(dim, updates, "k", "attr", "ts")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSeq

  test("changed attribute closes current and opens a new version") {
    val got = merged(Seq(("k1", "a2", 50L)).toDF("k", "attr", "ts"))
    assert(got == Seq(
      ("k1", "z", 1L, 10L),
      ("k1", "a", 10L, 50L),  // closed at the update ts
      ("k1", "a2", 50L, -1L), // new current
      ("k2", "b", 20L, -1L),
      ("k3", "c", 30L, -1L)))
  }

  test("unchanged attribute is a no-op; unseen key inserts") {
    val got = merged(Seq(
      ("k2", "b", 60L),  // same value — must not fork a version
      ("k9", "new", 70L) // first sighting
    ).toDF("k", "attr", "ts"))
    assert(got == Seq(
      ("k1", "z", 1L, 10L),
      ("k1", "a", 10L, -1L),
      ("k2", "b", 20L, -1L),
      ("k3", "c", 30L, -1L),
      ("k9", "new", 70L, -1L)))
  }

  test("multiple updates per key in one batch: only the latest applies") {
    val got = merged(Seq(
      ("k3", "c1", 40L),
      ("k3", "c2", 55L), // latest — the only one applied
      ("k3", "c0", 35L)
    ).toDF("k", "attr", "ts"))
    assert(got.filter(_._1 == "k3") == Seq(
      ("k3", "c", 30L, 55L),
      ("k3", "c2", 55L, -1L)))
  }

  test("merge is idempotent: re-applying the same delta changes nothing") {
    val delta = Seq(("k1", "a2", 50L), ("k9", "new", 70L)).toDF("k", "attr", "ts")
    val once = Scd2.merge(dim, delta, "k", "attr", "ts")
    val twice = Scd2.merge(once, delta, "k", "attr", "ts")
      .orderBy("k", "valid_from").collect().map(_.toString).toSeq
    assert(twice == once.orderBy("k", "valid_from").collect().map(_.toString).toSeq)
  }
}
