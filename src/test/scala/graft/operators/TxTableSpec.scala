package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TxTableSpec extends SparkSpec {
  import spark.implicits._

  test("commits are atomic versions; snapshots time-travel; deletes rewrite only affected files") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-spec-")
      .toString
    val a = Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("id", "s")
    val b = Seq((4L, "dd"), (5L, "ee")).toDF("id", "s")
    assert(TxTable.commitAppend(a.repartition(2), dir) == 1)
    assert(TxTable.commitAppend(b.repartition(1), dir) == 2)
    assert(TxTable.currentVersion(dir) == 2)
    // delete id=4: lives in v2's single file; v1's two files survive
    val before = TxTable.liveFiles(dir).toSet
    assert(TxTable.commitDelete(spark, dir, col("id") === 4L) == 3)
    val after = TxTable.liveFiles(dir).toSet
    assert(before.filter(_.startsWith("v00001")).subsetOf(after))
    assert(!after.exists(_.startsWith("v00002"))) // the affected file left
    // snapshots
    def ids(v: Int) = TxTable.snapshot(spark, dir, Some(v))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids(1) == Set(1L, 2L, 3L))
    assert(ids(2) == Set(1L, 2L, 3L, 4L, 5L))
    assert(ids(3) == Set(1L, 2L, 3L, 5L))
    // latest == v3
    assert(TxTable.snapshot(spark, dir).count() == 4)
    // no-match delete is a no-op commit (version unchanged)
    assert(TxTable.commitDelete(spark, dir, col("id") === 99L) == 3)
    // MERGE: same-key rows replaced, new keys appended, one commit
    val src = Seq((2L, "BB2"), (9L, "new")).toDF("id", "s")
    val mv = TxTable.commitMerge(spark, dir, src, "id")
    assert(mv == 4)
    val rows = TxTable.snapshot(spark, dir, Some(mv))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows(2L) == "BB2" && rows(9L) == "new" && rows(1L) == "aa")
    // compaction: fewer files, identical content, old versions intact
    val preFiles = TxTable.liveFiles(dir).size
    val cv = TxTable.commitCompact(spark, dir, targetFiles = 1)
    assert(cv == 5)
    assert(TxTable.liveFiles(dir).size == 1 && preFiles > 1)
    assert(ids(cv) == ids(mv))
    assert(ids(1) == Set(1L, 2L, 3L)) // time travel survives compaction
    // history: one row per version with add/remove counts
    val h = TxTable.history(dir)
    assert(h.map(_._1) == (1 to 5) && h.head == ((1, 2, 0)))
    // VACUUM from v4: v1-v3-only files go, retained versions still read
    val dead = TxTable.vacuum(dir, retainFrom = 4)
    assert(dead.nonEmpty)
    assert(ids(4) == Set(1L, 2L, 3L, 5L, 9L)) // retained horizon intact
    assert(ids(cv) == ids(mv))
    intercept[Exception] { ids(1) } // pre-horizon time travel is gone
    // optimistic concurrency: a racing writer of the same version fails
    val half = TxTable.currentVersion(dir)
    TxTable.commitAppend(a.limit(1), dir)
    intercept[Exception] {
      // force a duplicate version file: the commit point is CREATE_NEW
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "_txlog", f"v${half + 1}%05d.json"),
        "{}".getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
    }
    ()
  }
}
