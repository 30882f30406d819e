package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def store(): String =
    java.nio.file.Files.createTempDirectory("graft-incagg-").toString

  private def state(dir: String) =
    IncrementalAgg.read(spark, dir, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

  test("batches merge incrementally; view equals the full-history groupBy") {
    val dir = store()
    val b0 = Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "v")
    val b1 = Seq(("a", 3L), ("c", 7L)).toDF("k", "v")
    IncrementalAgg.mergeCountSum(dir, Seq("k"), "v")(b0, 0L)
    IncrementalAgg.mergeCountSum(dir, Seq("k"), "v")(b1, 1L)
    assert(state(dir) == Seq(("a", 3L, 6L), ("b", 1L, 10L), ("c", 1L, 7L)))
  }

  test("replaying a batch is idempotent (crash before checkpoint commit)") {
    val dir = store()
    val b0 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val b1 = Seq(("a", 5L)).toDF("k", "v")
    IncrementalAgg.mergeCountSum(dir, Seq("k"), "v")(b0, 0L)
    IncrementalAgg.mergeCountSum(dir, Seq("k"), "v")(b1, 1L)
    val once = state(dir)
    // replay batch 1 (same data, same id) — e.g. sink wrote but the
    // stream died before committing offset 1
    IncrementalAgg.mergeCountSum(dir, Seq("k"), "v")(b1, 1L)
    assert(state(dir) == once)
    assert(once == Seq(("a", 2L, 6L), ("b", 1L, 2L)))
  }

  test("mergeLatest keeps the max-(ord) row per key and replays idempotently") {
    val dir = store()
    def snap() = IncrementalAgg.read(spark, dir, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    val b0 = Seq(("u1", 10L, 1L, "view"), ("u1", 20L, 2L, "click"),
      ("u2", 5L, 3L, "view")).toDF("k", "sec", "id", "t")
    val b1 = Seq(("u1", 15L, 4L, "error"), // OLDER than u1's current
      ("u2", 5L, 9L, "purchase")) // same sec, higher id -> wins
      .toDF("k", "sec", "id", "t")
    IncrementalAgg.mergeLatest(dir, "k", Seq("sec", "id"), Seq("t"))(b0, 0L)
    IncrementalAgg.mergeLatest(dir, "k", Seq("sec", "id"), Seq("t"))(b1, 1L)
    val once = snap()
    // a late-arriving older fact must NOT regress the snapshot, and the
    // (sec, id) tiebreak must be lexicographic
    assert(once == Seq(("u1", 20L, 2L, "click"), ("u2", 5L, 9L, "purchase")))
    IncrementalAgg.mergeLatest(dir, "k", Seq("sec", "id"), Seq("t"))(b1, 1L)
    assert(snap() == once) // replay idempotent
  }

  test("old versions are pruned; the merge base survives for replay") {
    val dir = store()
    (0L to 4L).foreach { i =>
      IncrementalAgg.mergeCountSum(dir, Seq("k"), "v")(
        Seq(("a", i)).toDF("k", "v"), i)
    }
    val vers = new java.io.File(dir).list().filter(_.startsWith("state_b="))
    assert(vers.sorted.toSeq == Seq("state_b=3", "state_b=4"), vers.toSeq)
    assert(state(dir) == Seq(("a", 5L, 10L)))
  }

  test("readAt time-travels to the retained version at or below a batch") {
    val dir = store()
    val b0 = Seq(("a", 1L)).toDF("k", "v")
    val b1 = Seq(("a", 2L)).toDF("k", "v")
    IncrementalAgg.mergeCountSum(dir, Seq("k"), "v")(b0, 0L)
    IncrementalAgg.mergeCountSum(dir, Seq("k"), "v")(b1, 1L)
    val at0 = IncrementalAgg.readAt(spark, dir, 0L).get.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(at0 == Seq(("a", 1L, 1L)))
    val at1 = IncrementalAgg.readAt(spark, dir, 5L).get.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(at1 == Seq(("a", 2L, 3L)))
    assert(IncrementalAgg.readAt(spark, store(), 9L).isEmpty)
  }

  test("drives from a real micro-batch stream via foreachBatch") {
    val dir = store()
    val src = java.nio.file.Files.createTempDirectory("graft-incagg-src-").toString
    Seq(("a", 1L), ("b", 2L), ("a", 4L)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(src)
    val q = spark.readStream
      .schema("k STRING, v BIGINT")
      .option("maxFilesPerTrigger", 1).parquet(src)
      .writeStream
      .foreachBatch(IncrementalAgg.mergeCountSum(dir, Seq("k"), "v") _)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-incagg-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(state(dir) == Seq(("a", 2L, 5L), ("b", 1L, 2L)))
  }

  private def snap(dir: String) =
    IncrementalAgg.read(spark, dir, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq

  test("mergeCdc: upserts, deletes and carry-over across batches; replay idempotent") {
    val dir = store()
    val b0 = Seq((1L, 1L, "I", 10.0), (2L, 1L, "I", 20.0), (3L, 1L, "I", 30.0))
      .toDF("k", "ts", "op", "v")
    val b1 = Seq((1L, 2L, "U", 11.0), (2L, 2L, "D", 0.0), (9L, 2L, "I", 90.0))
      .toDF("k", "ts", "op", "v")
    IncrementalAgg.mergeCdc(dir, "k", "ts", "op", Seq("v"))(b0, 0L)
    IncrementalAgg.mergeCdc(dir, "k", "ts", "op", Seq("v"))(b1, 1L)
    val want = Seq((1L, 11.0), (3L, 30.0), (9L, 90.0))
    assert(snap(dir) == want)
    // replay batch 1 (crash before checkpoint commit) — same snapshot
    IncrementalAgg.mergeCdc(dir, "k", "ts", "op", Seq("v"))(b1, 1L)
    assert(snap(dir) == want)
  }

  test("mergeCdc drives from a real change stream via foreachBatch") {
    val dir = store()
    val src = java.nio.file.Files.createTempDirectory("graft-cdc-src-").toString
    Seq((1L, 1L, "I", 10.0), (2L, 1L, "I", 20.0), (1L, 2L, "U", 15.0),
        (2L, 3L, "D", 0.0))
      .toDF("k", "ts", "op", "v")
      .coalesce(1).write.mode("overwrite").parquet(src)
    val q = spark.readStream
      .schema("k BIGINT, ts BIGINT, op STRING, v DOUBLE")
      .option("maxFilesPerTrigger", 1).parquet(src)
      .writeStream
      .foreachBatch(IncrementalAgg.mergeCdc(dir, "k", "ts", "op", Seq("v")) _)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cdc-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(snap(dir) == Seq((1L, 15.0)))
  }

  test("mergeRetract: updates retract, deletes remove, stale rows drop, replay idempotent") {
    val dir = store()
    def agg() = IncrementalAgg.read(spark, s"$dir/agg", Seq("grp")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    def run(b: org.apache.spark.sql.DataFrame, id: Long) =
      IncrementalAgg.mergeRetract(dir, "k", "tso", "op", "grp", "v")(b, id)
    // batch 0: three keys across two groups
    run(Seq(("k1", 10L, "U", "g1", 100L), ("k2", 11L, "U", "g1", 200L),
      ("k3", 12L, "U", "g2", 50L)).toDF("k", "tso", "op", "grp", "v"), 0L)
    assert(agg() == Seq(("g1", 2L, 300L), ("g2", 1L, 50L)))
    // batch 1: k1 updated (retract 100, apply 150), k3 deleted,
    // and a STALE k2 update (tso 5 < stored 11) that must be ignored
    run(Seq(("k1", 20L, "U", "g1", 150L), ("k3", 21L, "D", "g2", 0L),
      ("k2", 5L, "U", "g1", 999L)).toDF("k", "tso", "op", "grp", "v"), 1L)
    assert(agg() == Seq(("g1", 2L, 350L)), agg().toString) // g2 emptied out
    // replay batch 1 (crash before offset commit): same state rebuilt
    run(Seq(("k1", 20L, "U", "g1", 150L), ("k3", 21L, "D", "g2", 0L),
      ("k2", 5L, "U", "g1", 999L)).toDF("k", "tso", "op", "grp", "v"), 1L)
    assert(agg() == Seq(("g1", 2L, 350L)))
    // batch 2: an update OLDER than k3's delete arrives late — the
    // tombstone must block it (without tombstones the key would
    // resurrect: the bug the first cross-engine run caught)
    run(Seq(("k3", 15L, "U", "g2", 77L)).toDF("k", "tso", "op", "grp", "v"), 2L)
    assert(agg() == Seq(("g1", 2L, 350L)), agg().toString)
    // batch 3: k3 re-inserted after its delete (newer ts beats the
    // tombstone); within-batch the latest (tso, op) per key wins — k1
    // gets two entries, 31 wins
    run(Seq(("k3", 30L, "U", "g2", 60L), ("k1", 31L, "U", "g1", 175L),
      ("k1", 30L, "U", "g1", 1L)).toDF("k", "tso", "op", "grp", "v"), 3L)
    assert(agg() == Seq(("g1", 2L, 375L), ("g2", 1L, 60L)))
    // the final view equals the brute-force latest-per-key recompute
    val log = Seq(("k1", 10L, "U", "g1", 100L), ("k2", 11L, "U", "g1", 200L),
      ("k3", 12L, "U", "g2", 50L), ("k1", 20L, "U", "g1", 150L),
      ("k3", 21L, "D", "g2", 0L), ("k2", 5L, "U", "g1", 999L),
      ("k3", 30L, "U", "g2", 60L), ("k1", 31L, "U", "g1", 175L),
      ("k1", 30L, "U", "g1", 1L))
    val brute = log.groupBy(_._1).map(_._2.maxBy(e => (e._2, e._3)))
      .filter(_._3 != "D").toSeq
      .groupBy(_._4).map { case (g, es) => (g, es.size.toLong,
        es.map(_._5).sum) }.toSeq.sortBy(_._1)
    assert(agg() == brute)
  }
}
