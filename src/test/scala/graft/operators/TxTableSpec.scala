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
    // optimistic concurrency: the version file is CREATE_NEW — a
    // second write of the same version file fails at the fs layer
    val half = TxTable.currentVersion(dir)
    TxTable.commitAppend(a.limit(1), dir)
    intercept[Exception] {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "_txlog", f"v${half + 1}%05d.json"),
        "{}".getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
    }
    ()
  }

  test("checkpoint: resolve-from-checkpoint == full replay, vacuum-safe") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-ckpt-")
      .toString
    // 12 commits with checkpointEvery=5 → checkpoints at v5 and v10
    (1 to 12).foreach { i =>
      TxTable.commitAppend(Seq((i.toLong, s"s$i")).toDF("id", "s")
        .repartition(1), dir, checkpointEvery = 5)
    }
    val lc = java.nio.file.Paths.get(dir, "_txlog", "_last_checkpoint")
    assert(java.nio.file.Files.exists(lc))
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(dir, "_txlog", "ckpt-v00010")))
    // fast path == full replay at latest and at historic versions,
    // including versions BEFORE the newest checkpoint (falls back to
    // the older checkpoint or full replay)
    for (v <- Seq(3, 5, 7, 10, 12)) {
      assert(TxTable.liveFilesFast(spark, dir, Some(v)) ==
        TxTable.liveFiles(dir, Some(v)), s"version $v")
    }
    assert(TxTable.snapshot(spark, dir).count() == 12)
    // a delete through the checkpointed table stays consistent
    TxTable.commitDelete(spark, dir, col("id") <= 2L,
      checkpointEvery = 5)
    assert(TxTable.liveFilesFast(spark, dir) == TxTable.liveFiles(dir))
    assert(TxTable.snapshot(spark, dir).count() == 10)
    // vacuum the pre-delete horizon: checkpointed resolution of the
    // retained versions still reads (the checkpoint references only
    // retained files after the suffix replay)
    TxTable.vacuum(dir, retainFrom = TxTable.currentVersion(dir))
    assert(TxTable.snapshot(spark, dir).count() == 10)
    assert(TxTable.liveFilesFast(spark, dir) == TxTable.liveFiles(dir))
    // a corrupt _last_checkpoint falls back, never breaks resolution
    java.nio.file.Files.write(lc, "garbage".getBytes("UTF-8"))
    assert(TxTable.liveFilesFast(spark, dir) == TxTable.liveFiles(dir))
  }

  test("concurrent appends both land, serialized, disjoint file sets") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-race-")
      .toString
    TxTable.commitAppend(Seq((0L, "base")).toDF("id", "s"), dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (1 to 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = TxTable.commitAppend(
            Seq((i.toLong, s"w$i")).toDF("id", "s").repartition(1), dir)
        })
      }
      val versions = futs.map(_.get()).sorted
      // every writer landed at its own consecutive version
      assert(versions == Seq(2, 3, 4, 5))
    } finally pool.shutdown()
    assert(TxTable.snapshot(spark, dir).count() == 5)
    // no data file is shared between commits (unique staging dirs)
    val byCommit = TxTable.history(dir).map(_._2)
    assert(TxTable.liveFiles(dir).size == byCommit.sum)
  }

  test("retry conflict matrix: appends retry, touched inputs abort") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-cfl-")
      .toString
    TxTable.commitAppend(Seq((1L, "a")).toDF("id", "s"), dir)
    // simulate: an interleaved APPEND landed at v2 under our feet
    TxTable.writeEntry(dir,
      TxTable.Entry(2, Seq("vx/interleaved.parquet"), Seq.empty))
    // append retries past it
    val v = TxTable.commitWithRetry(dir, Seq("vy/mine.parquet"),
      Seq.empty, firstV = 2, TxTable.AppendConflicts)
    assert(v == 3)
    // a rewrite (delete/merge) that lost to an interleaved ADD aborts:
    // the add may hold rows its predicate never saw
    TxTable.writeEntry(dir,
      TxTable.Entry(4, Seq("vz/other.parquet"), Seq.empty))
    intercept[TxTable.CommitConflictException] {
      TxTable.commitWithRetry(dir, Seq("vw/rewrite.parquet"),
        Seq("vy/mine.parquet"), firstV = 4,
        TxTable.rewriteConflicts(Set("vy/mine.parquet")))
    }
    // a rewrite whose inputs were REMOVED concurrently aborts
    TxTable.writeEntry(dir,
      TxTable.Entry(5, Seq.empty, Seq("vy/mine.parquet")))
    intercept[TxTable.CommitConflictException] {
      TxTable.commitWithRetry(dir, Seq("vw/rewrite2.parquet"),
        Seq("vy/mine.parquet"), firstV = 5,
        TxTable.rewriteConflicts(Set("vy/mine.parquet")))
    }
    // compaction tolerates interleaved appends (they stay live) but
    // aborts when an input vanished
    TxTable.writeEntry(dir,
      TxTable.Entry(6, Seq("vq/late.parquet"), Seq.empty))
    val cv = TxTable.commitWithRetry(dir, Seq("vc/compacted.parquet"),
      Seq("vx/interleaved.parquet"), firstV = 6,
      TxTable.compactConflicts(Set("vx/interleaved.parquet")))
    assert(cv == 7)
    intercept[TxTable.CommitConflictException] {
      // v7 (the compaction that just landed) removed vx/interleaved —
      // a second compaction that read it as an input must abort
      TxTable.commitWithRetry(dir, Seq("vc/compacted2.parquet"),
        Seq("vx/interleaved.parquet"), firstV = 7,
        TxTable.compactConflicts(Set("vx/interleaved.parquet")))
    }
    ()
  }

  test("DELETE keeps NULL-predicate rows (three-valued logic)") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-null-")
      .toString
    val rows = Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
      .toDF("id", "s")
    TxTable.commitAppend(rows.repartition(1), dir)
    // pred is NULL for id=2 — NOT TRUE, so the row must survive
    TxTable.commitDelete(spark, dir, col("s") === "a")
    val got = TxTable.snapshot(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  test("vacuum reclaims orphaned staging dirs; replayed batches no-op") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-orph-")
      .toString
    val df = Seq((1L, "a")).toDF("id", "s")
    assert(TxTable.commitAppendAt(df, dir, version = 1))
    // a replayed batch is a no-op BEFORE staging (no orphan made)
    assert(!TxTable.commitAppendAt(df, dir, version = 1))
    // fabricate an orphan: a staging dir no log entry references
    // (what a writer that died before its log write leaves behind)
    val orphan = java.nio.file.Paths.get(dir, "data", "v00009-deadbeef")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("part-0.parquet"),
      Array[Byte](1, 2, 3))
    // the fabricated orphan is seconds old; a production vacuum would
    // (correctly) leave it for the retention window — disable the
    // window to test the reclaim itself
    val reclaimed = TxTable.vacuum(dir, retainFrom = 1,
      tempRetainMillis = -1000L)
    assert(reclaimed.exists(_.startsWith("v00009-deadbeef")))
    assert(!java.nio.file.Files.exists(orphan))
    assert(TxTable.snapshot(spark, dir).count() == 1)
    // TREE age, not dir age: a partitioned writer's stage keeps its
    // top-level mtime at creation — only the partition subdir/file
    // mtimes move. An old dir holding a FRESH file is an in-flight
    // commit, not an orphan (the round-15 advice fix: pre-fix a
    // single commit outliving the retention window lost its stage)
    val inflight = java.nio.file.Paths.get(dir, "data", "v00010-inflight")
    val part = inflight.resolve("__p_lang=en")
    java.nio.file.Files.createDirectories(part)
    java.nio.file.Files.write(part.resolve("part-0.parquet"),
      Array[Byte](1, 2, 3))
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 30L * 24 * 3600 * 1000)
    java.nio.file.Files.setLastModifiedTime(inflight, old)
    java.nio.file.Files.setLastModifiedTime(part, old)
    TxTable.vacuum(dir, retainFrom = 1)
    assert(java.nio.file.Files.exists(part.resolve("part-0.parquet")),
      "a live (fresh-file) stage must survive vacuum")
    // once every byte in the tree is old it IS a crash leftover
    java.nio.file.Files.setLastModifiedTime(
      part.resolve("part-0.parquet"), old)
    TxTable.vacuum(dir, retainFrom = 1)
    assert(!java.nio.file.Files.exists(inflight),
      "an all-old orphan stage must be reclaimed")
  }

  test("per-file stats skip files; snapshotWhere == snapshot.filter always") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-skip-")
      .toString
    // three appends with DISJOINT id ranges → per-file [min,max] are
    // tight and a selective predicate should touch one file
    TxTable.commitAppend(
      spark.range(0, 100).selectExpr("id", "CAST(id AS STRING) AS s")
        .coalesce(1), dir, statsCols = Seq("id"))
    TxTable.commitAppend(
      spark.range(100, 200).selectExpr("id", "CAST(id AS STRING) AS s")
        .coalesce(1), dir, statsCols = Seq("id"))
    TxTable.commitAppend(
      spark.range(200, 300).selectExpr("id", "CAST(id AS STRING) AS s")
        .coalesce(1), dir, statsCols = Seq("id"))
    def check(pred: org.apache.spark.sql.Column,
        expectSkipped: Int): Unit = {
      val (kept, skipped) = TxTable.pruneFiles(spark, dir, pred)
      assert(skipped.size == expectSkipped,
        s"pred $pred: kept=$kept skipped=$skipped")
      val got = TxTable.snapshotWhere(spark, dir, pred)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      val want = TxTable.snapshot(spark, dir).filter(pred)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      assert(got == want)
    }
    check(col("id") === 150L, 2) // one file holds it
    check(col("id") < 50L, 2)
    check(col("id") >= 250L, 2)
    check(col("id") === 150L && col("s") =!= "x", 2) // AND: stats side prunes
    check(col("id") === 50L || col("id") === 250L, 1) // OR: both translate
    check(col("id").isin(10L, 20L), 2)
    check(col("s") === "150", 0) // uncovered column: keep everything
    check(lower(col("s")) === "150", 0) // untranslatable: keep everything
    check(lit(5L) > col("id"), 2) // literal-first comparison
    // all files pruned → empty result, schema intact
    val none = TxTable.snapshotWhere(spark, dir, col("id") === 999L)
    assert(none.count() == 0 && none.columns.contains("s"))
    // clustered OPTIMIZE: range-repartition on id keeps stats tight
    // after compaction (plain repartition would smear [min,max])
    TxTable.commitCompact(spark, dir, targetFiles = 3,
      statsCols = Seq("id"), clusterBy = Seq("id"))
    val (kept2, skipped2) = TxTable.pruneFiles(spark, dir, col("id") === 10L)
    assert(kept2.size == 1 && skipped2.size == 2)
    check(col("id") === 150L, 2)
    // a delete rewrite carries stats through
    TxTable.commitDelete(spark, dir, col("id") === 10L,
      statsCols = Seq("id"))
    check(col("id") === 11L, 2)
    // orphan stats sidecars are vacuumed with their stages
    val orphanStats = java.nio.file.Paths.get(dir, "_txlog",
      "stats-v00099-deadbeef")
    java.nio.file.Files.createDirectories(orphanStats)
    java.nio.file.Files.write(orphanStats.resolve("x.parquet"),
      Array[Byte](1))
    TxTable.vacuum(dir, retainFrom = TxTable.currentVersion(dir),
      tempRetainMillis = -1000L) // the fabricated orphan is fresh
    assert(!java.nio.file.Files.exists(orphanStats))
    check(col("id") === 11L, 2) // committed sidecars survived
  }

  test("bloom sidecars prune equality on random layouts minmax cannot") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-bloom-")
      .toString
    // HASH-random layout: every file's [min,max] spans ~the whole id
    // domain, so minmax pruning is useless — the bloom's case
    TxTable.commitAppend(
      spark.range(0, 4000)
        .selectExpr("id", "CAST(id AS STRING) AS s")
        .repartition(8), dir,
      statsCols = Seq("id"), bloomCols = Seq("id"))
    // an id lives in exactly one file: bloom keeps that file (never
    // false-negative) and at 500 ids/file vs 8192 positions the other
    // 7 should essentially always prune
    val (kept, skipped) = TxTable.pruneFiles(spark, dir, col("id") === 77L)
    assert(kept.size <= 2 && skipped.size >= 6,
      s"kept=${kept.size} skipped=${skipped.size}")
    val got = TxTable.snapshotWhere(spark, dir, col("id") === 77L)
      .select(col("s")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("77"))
    // IN-list: union of per-value admissions, still mostly pruned
    val (kept2, skipped2) = TxTable.pruneFiles(spark, dir,
      col("id").isin(77L, 3999L))
    assert(skipped2.size >= 5 && kept2.size >= 1)
    assert(TxTable.snapshotWhere(spark, dir, col("id").isin(77L, 3999L))
      .count() == 2)
    // string bloom: same machinery on a VARCHAR column
    val dir2 = java.nio.file.Files.createTempDirectory("txtable-bloom2-")
      .toString
    TxTable.commitAppend(
      spark.range(0, 4000)
        .selectExpr("id", "concat('k', id) AS s")
        .repartition(8), dir2, bloomCols = Seq("s"))
    val (kept3, skipped3) = TxTable.pruneFiles(spark, dir2,
      col("s") === "k2345")
    assert(skipped3.size >= 6)
    assert(TxTable.snapshotWhere(spark, dir2, col("s") === "k2345")
      .count() == 1)
    // a non-bloom-safe comparison (range) on a bloom-only column
    // cannot prune — soundness over eagerness
    val (kept4, skipped4) = TxTable.pruneFiles(spark, dir2,
      col("s") > "k999")
    assert(skipped4.isEmpty && kept4.size == 8)
  }

  test("streaming CDF source: drained stream == batch change feed") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("txtable-scdf-")
      .toString
    TxTable.commitAppend(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), dir)
    TxTable.commitAppend(Seq((3L, "c")).toDF("id", "s"), dir)
    TxTable.commitDelete(spark, dir, col("id") === 2L)
    // a merge-on-read delete must flow through the streamed feed
    // exactly like a rewriting one (changes() serves both)
    TxTable.commitDeleteDV(spark, dir, col("id") === 3L)
    val ckpt = java.nio.file.Files
      .createTempDirectory("txtable-scdf-ckpt-").toString
    val name = s"scdf_${System.nanoTime()}"
    val q = spark.readStream.format("txlog-cdf").load(dir)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(name)
      .select(col("_commit_version"), col("_change_type"), col("id"),
        col("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    val batch = TxTable.changes(spark, dir, 0)
      .select(col("_commit_version"), col("_change_type"), col("id"),
        col("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    assert(streamed == batch && batch.nonEmpty)
    // resume from the checkpoint: a NEW commit arrives, a second
    // AvailableNow drain processes ONLY it (offsets persisted)
    TxTable.commitAppend(Seq((9L, "z")).toDF("id", "s"), dir)
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long)]())
    val q2 = spark.readStream.format("txlog-cdf").load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select(col("_commit_version"), col("id")).collect()
          .foreach(r => got.add((r.getLong(0), r.getLong(1))))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == Set((5L, 9L)))
  }

  test("change feed: net per-commit diffs, OPTIMIZE silent, updates keyed") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-cdf-")
      .toString
    // v1 append, v2 append, v3 delete id<=2, v4 compact, v5 merge
    TxTable.commitAppend(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
        .repartition(2), dir)
    TxTable.commitAppend(Seq((4L, "d")).toDF("id", "s"), dir)
    TxTable.commitDelete(spark, dir, col("id") <= 2L)
    TxTable.commitCompact(spark, dir, targetFiles = 1)
    TxTable.commitMerge(spark, dir,
      Seq((3L, "C2"), (9L, "new")).toDF("id", "s"), "id")

    def feed(from: Int, to: Option[Int] = None) =
      TxTable.changes(spark, dir, from, to)
        .select(col("_commit_version"), col("_change_type"),
          col("id"), col("s"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getString(3))).toSet

    // full feed: v1/v2 inserts, v3 net deletes (survivor id=3 of the
    // rewritten file CANCELS), v4 (dataChange=false) absent entirely,
    // v5 old/new rows of the merged key + the brand-new key
    assert(feed(0) == Set(
      (1L, "insert", 1L, "a"), (1L, "insert", 2L, "b"),
      (1L, "insert", 3L, "c"), (2L, "insert", 4L, "d"),
      (3L, "delete", 1L, "a"), (3L, "delete", 2L, "b"),
      (5L, "delete", 3L, "c"), (5L, "insert", 3L, "C2"),
      (5L, "insert", 9L, "new")))
    assert(!feed(0).exists(_._1 == 4L))
    // range reads slice the same feed
    assert(feed(3) == feed(0).filter(_._1 > 3))
    // a range covering only the compaction is empty, with the schema
    val only4 = TxTable.changes(spark, dir, 3, Some(4))
    assert(only4.count() == 0 &&
      only4.columns.contains("_change_type"))
    // keyed reclassification: v5's same-key pair becomes an update,
    // the brand-new key stays an insert
    val up = TxTable.changesWithUpdates(spark, dir, 4, keyCol = "id")
      .select(col("_change_type"), col("id"), col("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(up == Set(("update_preimage", 3L, "c"),
      ("update_postimage", 3L, "C2"), ("insert", 9L, "new")))
    // replaying the feed from empty reconstructs the latest snapshot
    // (the CDF-consumer invariant): inserts minus deletes == table
    val replayed = TxTable.changes(spark, dir, 0)
      .filter(col("_change_type") === "insert").select(col("id"), col("s"))
      .exceptAll(TxTable.changes(spark, dir, 0)
        .filter(col("_change_type") === "delete")
        .select(col("id"), col("s")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val snap = TxTable.snapshot(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(replayed == snap)
  }

  test("OPTIMIZE ZORDER: two-key boxes prune where one-axis cannot") {
    val dir = java.nio.file.Files
      .createTempDirectory("txtable-zorder-").toString
    // 4096 rows on a 64x64 integer grid: x uniform, y = a reshuffle
    // of x (so x-clustered files each span the WHOLE y domain)
    val grid = spark.range(4096)
      .select(col("id").as("x"), ((col("id") * 2654435761L) % 4096).as("y"),
        col("id").as("payload"))
    TxTable.commitAppend(grid.repartitionByRange(16, col("x")), dir,
      statsCols = Seq("x", "y"))
    val vz = TxTable.commitCompact(spark, dir, targetFiles = 16,
      statsCols = Seq("x", "y"), zOrderBy = Seq("x", "y"))
    // dataChange=false: readers at v1 still see the linear layout
    val pred = col("y") >= 1000L && col("y") <= 1100L
    val (keptZ, skippedZ) = TxTable.pruneFiles(spark, dir, pred)
    val (keptL, _) = TxTable.pruneFiles(spark, dir, pred, Some(1))
    assert(keptL.size == 16, "x-clustered files all span the y domain")
    assert(skippedZ.nonEmpty && keptZ.size < keptL.size,
      s"z layout must prune a pure-y predicate: ${keptZ.size} vs ${keptL.size}")
    // a two-key box prunes harder than either axis alone
    val box = col("x") >= 512L && col("x") <= 1023L && pred
    val (keptBox, _) = TxTable.pruneFiles(spark, dir, box)
    assert(keptBox.size <= keptZ.size)
    // skipping is SOUND: snapshotWhere == snapshot.filter, both
    // layouts, and compaction changed no row
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(TxTable.snapshotWhere(spark, dir, pred)) ==
      rows(TxTable.snapshot(spark, dir).filter(pred)))
    assert(rows(TxTable.snapshotWhere(spark, dir, pred, Some(1))) ==
      rows(TxTable.snapshot(spark, dir, Some(vz)).filter(pred)))
    // zOrderBy and clusterBy are mutually exclusive; arity enforced
    assertThrows[IllegalArgumentException](TxTable.commitCompact(
      spark, dir, 4, zOrderBy = Seq("x")))
    assertThrows[IllegalArgumentException](TxTable.commitCompact(
      spark, dir, 4, clusterBy = Seq("x"), zOrderBy = Seq("x", "y")))
  }

  test("wide delete: affected-file resolution is exact at many files") {
    val dir = java.nio.file.Files
      .createTempDirectory("txtable-wide-").toString
    // 256 files, each owning a contiguous id slice
    TxTable.commitAppend(
      spark.range(0, 25600).select(col("id"))
        .repartitionByRange(256, col("id")),
      dir, statsCols = Seq("id"))
    val before = TxTable.liveFiles(dir).toSet
    assert(before.size == 256)
    // a point delete touches exactly ONE of the 256 files
    TxTable.commitDelete(spark, dir, col("id") === 12345L)
    val after = TxTable.liveFiles(dir).toSet
    assert((before -- after).size == 1,
      s"exactly one file rewritten, got ${(before -- after).size}")
    assert(TxTable.snapshot(spark, dir).count() == 25599L)
    assert(TxTable.snapshot(spark, dir)
      .filter(col("id") === 12345L).count() == 0L)
    // a merge against a handful of keys touches only their files
    import spark.implicits._
    TxTable.commitMerge(spark, dir,
      Seq(100L, 20000L).toDF("id"), "id")
    val after2 = TxTable.liveFiles(dir).toSet
    assert((after -- after2).size == 2,
      s"exactly two files rewritten, got ${(after -- after2).size}")
    assert(TxTable.snapshot(spark, dir).count() == 25599L)
  }

  test("near-dup MERGE: index-backed keep-first, replay is a no-op") {
    val tmp = java.nio.file.Files
      .createTempDirectory("txtable-ndmerge-").toString
    val (tdir, sdir) = (s"$tmp/table", s"$tmp/sigs")
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra"
    val other = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen"
    val fresh = "red orange yellow green blue indigo violet cyan " +
      "magenta teal maroon olive navy silver gold bronze copper"
    def ingest(rows: Seq[(Long, String)]) = {
      import spark.implicits._
      TxTable.commitMergeNearDup(spark, tdir, sdir,
        rows.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, threshold = 0.5)
    }
    // batch 1: 1 keeps, 3 keeps (unrelated), 5 = near-dup of 1 ->
    // dropped by the greedy internal pair rule (1 < 5)
    val v1 = ingest(Seq((1L, base), (3L, other),
      (5L, base + " tango")))
    assert(TxTable.snapshot(spark, tdir).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // replaying the identical batch commits NOTHING (idempotent)
    assert(ingest(Seq((1L, base), (3L, other), (5L, base + " tango"))) == v1)
    assert(TxTable.currentVersion(tdir) == v1)
    // batch 2: 2 = near-dup of indexed 1 -> dropped via the persisted
    // signature index (the corpus text is never re-read); 4 is new ->
    // kept; 6 = near-dup of 4 (same batch) -> greedy-dropped
    ingest(Seq((2L, base + " uniform"), (4L, fresh),
      (6L, fresh + " zulu")))
    assert(TxTable.snapshot(spark, tdir).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
    // the index mirrors the table's survivors exactly
    val idx = spark.read.parquet(sdir).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(idx == Set(1L, 3L, 4L))
  }

  test("exact-substring MERGE: winnow-indexed keep-first, replay no-op") {
    val tmp = java.nio.file.Files
      .createTempDirectory("txtable-exmerge-").toString
    val (tdir, fdir) = (s"$tmp/table", s"$tmp/fps")
    // seeded PRNG filler: a weaker arithmetic-hash filler produced
    // REAL shared 32-char runs between "unrelated" docs (its mod-26
    // increments are near-constant), which this operator correctly
    // detected — the test needs genuinely incompressible filler
    def filler(seed: Int, n: Int): String = {
      val r = new scala.util.Random(seed)
      (0 until n).map(_ => ('A' + r.nextInt(26)).toChar).mkString
    }
    val run = "abcdefghijklmnopqrstuvwxyz0123456789" // 36 > t=32
    def ingest(rows: Seq[(Long, String)]) = {
      import spark.implicits._
      TxTable.commitMergeExactSub(spark, tdir, fdir,
        rows.toDF("doc_id", "text"), "doc_id", "text", k = 8, t = 32)
    }
    // 1 keeps; 3 keeps (no shared 32-run); 5 embeds the same run -> dropped
    val v1 = ingest(Seq(
      (1L, filler(1, 40) + run + filler(2, 30)),
      (3L, filler(3, 90)),
      (5L, filler(4, 21) + run + filler(5, 44))))
    assert(TxTable.snapshot(spark, tdir).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // replay: no commit
    assert(ingest(Seq(
      (1L, filler(1, 40) + run + filler(2, 30)),
      (3L, filler(3, 90)),
      (5L, filler(4, 21) + run + filler(5, 44)))) == v1)
    // batch 2: 2 shares the indexed run -> dropped via the store;
    // 4 is clean -> kept
    ingest(Seq(
      (2L, filler(6, 11) + run + filler(7, 70)),
      (4L, filler(8, 95))))
    assert(TxTable.snapshot(spark, tdir).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
    // the index mirrors the survivors
    assert(spark.read.parquet(fdir).select("did")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
  }

  test("index rebuild converges to the incrementally-built store") {
    val tmp = java.nio.file.Files
      .createTempDirectory("txtable-rebuild-").toString
    val (tdir, sdir, fdir) =
      (s"$tmp/table", s"$tmp/sigs", s"$tmp/fps")
    def filler(seed: Int, n: Int): String = {
      val r = new scala.util.Random(seed)
      (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    import spark.implicits._
    val rows = (1L to 12L).map(i => (i, filler(i.toInt, 120) +
      " alpha bravo charlie delta echo foxtrot golf hotel"))
    TxTable.commitMergeNearDup(spark, tdir, sdir,
      rows.take(6).toDF("doc_id", "text"), "doc_id", "text",
      n = 3, threshold = 0.9)
    TxTable.commitMergeNearDup(spark, tdir, sdir,
      rows.drop(6).toDF("doc_id", "text"), "doc_id", "text",
      n = 3, threshold = 0.9)
    def sigRows(d: String) = spark.read.parquet(d)
      .selectExpr("id", "cast(sig as string)")
      .collect().map(_.toString).sorted.toSeq
    val incremental = sigRows(sdir)
    // simulate the crash-recovery path: rebuild from the TABLE
    TxTable.rebuildNearDupIndex(spark, tdir, sdir, "doc_id", "text", 3)
    assert(sigRows(sdir) == incremental,
      "rebuilt sig index must equal the incrementally-built one")
    // same for the winnowing store
    val t2 = s"$tmp/table2"
    TxTable.commitMergeExactSub(spark, t2, fdir,
      rows.take(6).toDF("doc_id", "text"), "doc_id", "text")
    TxTable.commitMergeExactSub(spark, t2, fdir,
      rows.drop(6).toDF("doc_id", "text"), "doc_id", "text")
    def fpRows(d: String) = spark.read.parquet(d)
      .collect().map(_.toString).sorted.toSeq
    val incFp = fpRows(fdir)
    TxTable.rebuildWinnowIndex(spark, t2, fdir, "doc_id", "text")
    assert(fpRows(fdir) == incFp,
      "rebuilt fp index must equal the incrementally-built one")
  }

  test("change feed: rewrite that DROPS a column cannot cancel its rows") {
    // schema evolution inside one rewrite commit: the removed files
    // carry `extra`, the added files don't. Aligning removes to the
    // adds' columns (the old behavior) would project BOTH wide rows to
    // (1, 'a') and let one cancel the re-landed survivor — silently
    // eating a delete. The feed must align on the column SUPERSET.
    val dir = java.nio.file.Files
      .createTempDirectory("txtable-evo-").toString
    val data = java.nio.file.Paths.get(dir, "data")
    def writeRel(df: org.apache.spark.sql.DataFrame,
        sub: String): Seq[String] = {
      df.coalesce(1).write.parquet(data.resolve(sub).toString)
      data.resolve(sub).toFile.list().toSeq
        .filter(_.endsWith(".parquet")).sorted.map(n => s"$sub/$n")
    }
    // v1: two rows that differ ONLY in the soon-dropped column
    val wide = writeRel(
      Seq((1L, "a", "x1"), (1L, "a", "x2")).toDF("id", "s", "extra"), "w")
    // v2 rewrite: drops `extra`, re-lands one surviving row
    val narrow = writeRel(Seq((1L, "a")).toDF("id", "s"), "n")
    TxTable.writeEntry(dir, TxTable.Entry(1, wide, Nil))
    TxTable.writeEntry(dir, TxTable.Entry(2, narrow, wide))
    val feed = TxTable.changes(spark, dir, 1, Some(2))
      .select(col("_change_type"), col("id"), col("s"), col("extra"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(feed == Set(
      ("delete", 1L, "a", Some("x1")),
      ("delete", 1L, "a", Some("x2")),
      ("insert", 1L, "a", None)),
      s"rows differing only in the dropped column must not cancel: $feed")
  }

  test("deletion vectors: merge-on-read delete touches no data file; purge materializes") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-dv-")
      .toString
    val rows = (1L to 20L).map(i => (i, s"s$i")).toDF("id", "s")
    TxTable.commitAppend(rows.repartition(4), dir) // v1
    val filesV1 = TxTable.liveFiles(dir).toSet
    def ids(v: Option[Int] = None) = TxTable.snapshot(spark, dir, v)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    // v2: DV delete of multiples of 5 — NO file changes
    assert(TxTable.commitDeleteDV(spark, dir, col("id") % 5 === 0) == 2)
    assert(TxTable.liveFiles(dir).toSet == filesV1,
      "a DV delete must not rewrite any data file")
    assert(ids() == (1L to 20L).filterNot(_ % 5 == 0).toSet)
    assert(ids(Some(1)) == (1L to 20L).toSet, "time travel past the DV")
    // v3: stacked DV delete — already-deleted rows invisible to it
    assert(TxTable.commitDeleteDV(spark, dir, col("id") <= 6L) == 3)
    assert(ids() == (7L to 20L).filterNot(_ % 5 == 0).toSet)
    assert(TxTable.liveFiles(dir).toSet == filesV1)
    // a no-match DV delete is a no-op (no commit, no leaked DV dir)
    assert(TxTable.commitDeleteDV(spark, dir, col("id") === 99L) == 3)
    // snapshotWhere sees through DVs too
    assert(TxTable.snapshotWhere(spark, dir, col("id") < 10L)
      .select(col("id")).collect().map(_.getLong(0)).toSet ==
      Set(7L, 8L, 9L))
    // the change feed reports each DV commit's own deleted rows
    val feed = TxTable.changes(spark, dir, 1)
      .select(col("_commit_version"), col("_change_type"), col("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(feed == (Seq(5L, 10L, 15L, 20L).map(i => (2L, "delete", i)) ++
      Seq(1L, 2L, 3L, 4L, 6L).map(i => (3L, "delete", i))).toSet,
      s"DV feed mismatch: $feed")
    // SQL surface is loud while DVs are in force
    intercept[IllegalArgumentException] {
      TxTable.resolvedScanPaths(spark, dir)
    }
    // v4: PURGE — content identical, DV state cleared, only DV'd
    // files rewritten, dataChange=false (feed must skip it)
    val visBefore = ids()
    assert(TxTable.commitPurgeDVs(spark, dir) == 4)
    assert(ids() == visBefore, "purge may not change visibility")
    assert(TxTable.dvRefsAt(dir).isEmpty, "purge clears the DV state")
    assert(TxTable.resolvedScanPaths(spark, dir).nonEmpty)
    assert(TxTable.changes(spark, dir, 3).count() == 0,
      "purge is dataChange=false: the feed skips it")
    // a rewriting delete AFTER a fresh DV materializes it: deleted
    // rows may never resurrect through the rewrite path
    TxTable.commitDeleteDV(spark, dir, col("id") === 7L) // v5
    TxTable.commitDelete(spark, dir, col("id") === 8L) // v6 rewrites
    assert(!ids().contains(7L) && !ids().contains(8L),
      "rewrite must materialize the file's DV, not resurrect rows")
    ()
  }

  test("DV concurrency matrix: DV∥DV lands, DV∥rewrite aborts") {
    // pure conflict-function checks (the matrix itself)
    val dvEntry = TxTable.Entry(5, Nil, Nil, dvs = Seq("dv-x"))
    val resetEntry = TxTable.Entry(5, Nil, Nil, dvReset = true)
    assert(TxTable.rewriteConflicts(Set("f"))(Seq(dvEntry)).nonEmpty,
      "a rewrite racing a DV commit would resurrect its deleted rows")
    assert(TxTable.compactConflicts(Set("f"))(Seq(dvEntry)).nonEmpty)
    assert(TxTable.dvDeleteConflicts(Set("f"))(Seq(dvEntry)).isEmpty,
      "two DV position sets union commutatively — both must land")
    assert(TxTable.dvDeleteConflicts(Set("f"))(Seq(resetEntry)).nonEmpty)
    assert(TxTable.dvDeleteConflicts(Set("f"))(
      Seq(TxTable.Entry(5, Seq("g/x.parquet"), Nil))).nonEmpty)
    // end-to-end: two DV deletes racing the same version — the loser
    // retries at the next version and lands; both predicates' rows
    // end up deleted
    val dir = java.nio.file.Files.createTempDirectory("txtable-dvrace-")
      .toString
    val rows = (1L to 10L).map(i => (i, s"s$i")).toDF("id", "s")
    TxTable.commitAppend(rows.repartition(2), dir) // v1
    // simulate the interleave: steal v2 with a pure DV entry between
    // the racer's scan and its commit — the racer must retry to v3
    val stolen = TxTable.Entry(2, Nil, Nil, dvs = Seq.empty)
    TxTable.writeEntry(dir, stolen)
    val v = TxTable.commitDeleteDV(spark, dir, col("id") === 9L)
    assert(v == 3, s"DV delete must retry past the stolen version, got v$v")
    assert(!TxTable.snapshot(spark, dir).select(col("id"))
      .collect().map(_.getLong(0)).contains(9L))
    ()
  }

  test("review fixes: purge-reset race, clone feed, empty batch, quoted exprs, DV horizon, hostile paths") {
    // (1) a purge whose DV'd files are all dead must STILL conflict
    // with an interleaved DV commit (clearing an unseen DV would
    // resurrect its rows) — the matrix itself, plus the benign-retry
    // path end-to-end (an interleaved plain append serializes fine)
    assert(TxTable.dvResetConflicts(
      Seq(TxTable.Entry(9, Nil, Nil, dvs = Seq("dv-x")))).nonEmpty)
    assert(TxTable.dvResetConflicts(
      Seq(TxTable.Entry(9, Nil, Nil, dvReset = true))).nonEmpty)
    assert(TxTable.dvResetConflicts(
      Seq(TxTable.Entry(9, Seq("g/x.parquet"), Nil))).isEmpty)
    val d1 = java.nio.file.Files.createTempDirectory("txfix1-").toString
    TxTable.commitAppend(
      (1L to 8L).map(i => (i, s"s$i")).toDF("id", "s").coalesce(1), d1)
    TxTable.commitDeleteDV(spark, d1, col("id") === 2L) // v2
    TxTable.commitDelete(spark, d1, col("id") === 3L) // v3 rewrites all
    // steal the purge's first version with a PLAIN append — the
    // empty-affected reset must retry past it and land
    TxTable.writeEntry(d1, TxTable.Entry(4, Nil, Nil))
    assert(TxTable.commitPurgeDVs(spark, d1) == 5)
    assert(TxTable.dvRefsAt(d1).isEmpty)
    // (2) the change feed of a shallow clone applies the inherited DV
    // to the clone's first (adds+dvs) entry
    val root2 = java.nio.file.Files.createTempDirectory("txfix2-")
      .toString
    val (src2, dst2) = (s"$root2/src", s"$root2/dst")
    TxTable.commitAppend(
      (1L to 6L).map(i => (i, s"s$i")).toDF("id", "s").coalesce(1), src2)
    TxTable.commitDeleteDV(spark, src2, col("id") === 5L)
    TxTable.cloneShallow(spark, src2, dst2)
    val feedIds = TxTable.changes(spark, dst2, 0)
      .filter(col("_change_type") === "insert")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(feedIds == (1L to 6L).toSet - 5L,
      s"the clone feed must not resurrect DV-deleted rows: $feedIds")
    // (3) an empty batch under a CHECK constraint is violation-free,
    // not an NPE
    val d3 = java.nio.file.Files.createTempDirectory("txfix3-").toString
    TxTable.addCheckConstraint(spark, d3, "pos", "id > 0")
    assert(TxTable.commitAppendAt(
      Seq.empty[(Long, String)].toDF("id", "s"), d3, version = 1))
    // (4) a constraint expression CONTAINING double quotes survives
    // the registry round-trip
    TxTable.addCheckConstraint(spark, d3, "notx", "s <> \"x\"")
    assert(TxTable.checkConstraints(d3).toMap.apply("notx") ==
      "s <> \"x\"")
    assert(TxTable.commitAppend(Seq((2L, "ok")).toDF("id", "s"), d3) == 2)
    intercept[TxTable.ConstraintViolationException] {
      TxTable.commitAppend(Seq((3L, "x")).toDF("id", "s"), d3)
    }
    // (5) RESTORE refuses to re-point at a vacuumed DV sidecar
    val d5 = java.nio.file.Files.createTempDirectory("txfix5-").toString
    TxTable.commitAppend(
      (1L to 6L).map(i => (i, s"s$i")).toDF("id", "s").coalesce(1), d5)
    TxTable.commitDeleteDV(spark, d5, col("id") === 2L) // v2
    TxTable.commitRestore(spark, d5, toVersion = 1) // v3 clears DVs
    TxTable.vacuum(d5, retainFrom = 3) // reclaims v2's DV dir
    intercept[IllegalArgumentException] {
      TxTable.commitRestore(spark, d5, toVersion = 2)
    }
    // (6) a logged name containing ',' ']' and '"' round-trips the
    // hand-rolled JSON (a clone may reference such a source path)
    val d6 = java.nio.file.Files.createTempDirectory("txfix6-").toString
    val weird = "/weird,dir/a\"b]c.parquet"
    TxTable.writeEntry(d6, TxTable.Entry(1, Seq(weird, "n/p.parquet"),
      Seq.empty))
    assert(TxTable.liveFiles(d6) == Seq(weird, "n/p.parquet"))
    ()
  }

  test("vacuum reclaims dead DV sidecars, keeps in-force ones") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-dvvac-")
      .toString
    val rows = (1L to 10L).map(i => (i, s"s$i")).toDF("id", "s")
    TxTable.commitAppend(rows.repartition(2), dir) // v1
    TxTable.commitDeleteDV(spark, dir, col("id") === 3L) // v2
    TxTable.commitPurgeDVs(spark, dir) // v3: v2's DV now dead past v2
    TxTable.commitDeleteDV(spark, dir, col("id") === 5L) // v4: in force
    import scala.jdk.CollectionConverters._
    def dvCount = {
      val st = java.nio.file.Files.list(
        java.nio.file.Paths.get(dir, "_txlog"))
      try st.iterator().asScala
        .count(_.getFileName.toString.startsWith("dv-"))
      finally st.close()
    }
    assert(dvCount == 2)
    val reclaimed = TxTable.vacuum(dir, retainFrom = 3)
    assert(reclaimed.exists(_.startsWith("dv-")),
      s"the purged-over DV must be reclaimed: $reclaimed")
    assert(dvCount == 1, "the in-force DV must survive")
    assert(TxTable.snapshot(spark, dir).select(col("id"))
      .collect().map(_.getLong(0)).toSet ==
      (1L to 10L).toSet -- Set(3L, 5L))
    ()
  }

  test("restore: live set and DV state roll back as one new commit") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-restore-")
      .toString
    val a = (1L to 6L).map(i => (i, s"a$i")).toDF("id", "s")
    val b = (7L to 9L).map(i => (i, s"b$i")).toDF("id", "s")
    TxTable.commitAppend(a.repartition(2), dir) // v1
    TxTable.commitAppend(b.repartition(1), dir) // v2
    TxTable.commitDelete(spark, dir, col("id") % 3 === 0) // v3
    TxTable.commitDeleteDV(spark, dir, col("id") === 1L) // v4
    def ids(v: Option[Int] = None) = TxTable.snapshot(spark, dir, v)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids() == Set(2L, 4L, 5L, 7L, 8L))
    // v5: RESTORE to v2 — files AND DV state back; no data moved
    val rv = TxTable.commitRestore(spark, dir, toVersion = 2)
    assert(rv == 5)
    assert(ids() == (1L to 9L).toSet)
    assert(ids(Some(4)) == Set(2L, 4L, 5L, 7L, 8L),
      "versions after the restore point stay queryable")
    assert(TxTable.dvRefsAt(dir).isEmpty)
    // the feed reports the restore's NET effect: the rows that came
    // back (deleted by v3's rewrite and v4's DV)
    val feed = TxTable.changes(spark, dir, 4)
      .select(col("_change_type"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed == Set(("insert", 3L), ("insert", 6L), ("insert", 9L),
      ("insert", 1L)), s"restore feed mismatch: $feed")
    // restoring to the DV version reinstates the DV refs
    TxTable.commitRestore(spark, dir, toVersion = 4) // v6
    assert(ids() == Set(2L, 4L, 5L, 7L, 8L))
    assert(TxTable.dvRefsAt(dir).nonEmpty,
      "restore must reinstate the target's DV state")
    // restore past the vacuum horizon fails loudly
    TxTable.commitCompact(spark, dir, targetFiles = 1) // v7
    TxTable.vacuum(dir, retainFrom = 7)
    intercept[IllegalArgumentException] {
      TxTable.commitRestore(spark, dir, toVersion = 1)
    }
    ()
  }

  test("incremental OPTIMIZE: sweeps small files only, content and big files untouched") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-small-")
      .toString
    val big = (1L to 200L).map(i => (i, "x" * 50 + i)).toDF("id", "s")
    TxTable.commitAppend(big.coalesce(1), dir) // v1: one at-size file
    val bigFile = TxTable.liveFiles(dir).head
    val bigSize = java.nio.file.Files.size(
      java.nio.file.Paths.get(dir, "data", bigFile))
    (0 until 4).foreach { r =>
      TxTable.commitAppend(
        Seq((1000L + r, s"t$r")).toDF("id", "s").coalesce(1), dir)
    }
    // a DV on one small input must be materialized by the sweep
    TxTable.commitDeleteDV(spark, dir, col("id") === 1001L)
    val pre = TxTable.snapshot(spark, dir).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    val v = TxTable.commitCompactSmall(spark, dir, smallBytes = bigSize)
    assert(v > 0)
    val live = TxTable.liveFiles(dir)
    assert(live.contains(bigFile), "the at-size file must survive")
    assert(live.size == 2, s"4 small files must sweep into 1: $live")
    assert(TxTable.snapshot(spark, dir).select(col("id"))
      .collect().map(_.getLong(0)).toSet == pre,
      "OPTIMIZE may never change a row")
    assert(!pre.contains(1001L), "the DV'd row stays deleted")
    assert(TxTable.changes(spark, dir, v - 1).count() == 0,
      "dataChange=false: the feed skips the sweep")
    // all-at-size table → no-op
    assert(TxTable.commitCompactSmall(spark, dir, smallBytes = 1L) == v)
    ()
  }

  test("CHECK constraints: all-or-nothing enforcement, NULL passes, drop lifts") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-ck-")
      .toString
    TxTable.addCheckConstraint(spark, dir, "pos", "id > 0")
    val bad = Seq((1L, "a"), (-2L, "b")).toDF("id", "s")
    intercept[TxTable.ConstraintViolationException] {
      TxTable.commitAppend(bad, dir)
    }
    assert(TxTable.currentVersion(dir) == 0,
      "a rejected commit leaves nothing behind")
    // NULL passes (SQL CHECK three-valued semantics)
    val withNull = Seq((Some(3L), "c"), (None: Option[Long], "d"))
      .toDF("id", "s")
    assert(TxTable.commitAppend(withNull, dir) == 1)
    // MERGE enforces on its source
    intercept[TxTable.ConstraintViolationException] {
      TxTable.commitMerge(spark, dir, bad, "id")
    }
    // the streaming commit path enforces too
    intercept[TxTable.ConstraintViolationException] {
      TxTable.commitAppendAt(bad, dir, version = 2)
    }
    // adding a constraint the EXISTING data violates is rejected
    intercept[TxTable.ConstraintViolationException] {
      TxTable.addCheckConstraint(spark, dir, "short", "length(s) > 5")
    }
    // drop lifts enforcement
    TxTable.dropCheckConstraint(dir, "pos")
    assert(TxTable.checkConstraints(dir).isEmpty)
    assert(TxTable.commitAppend(bad, dir) == 2)
    ()
  }

  test("shallow clone: zero-copy, copy-on-write, vacuum-safe") {
    val root = java.nio.file.Files.createTempDirectory("txtable-clone-")
      .toString
    val (src, dst) = (s"$root/src", s"$root/dst")
    val rows = (1L to 12L).map(i => (i, s"s$i")).toDF("id", "s")
    TxTable.commitAppend(rows.repartition(3), src) // src v1
    TxTable.commitDeleteDV(spark, src, col("id") === 12L) // src v2
    assert(TxTable.cloneShallow(spark, src, dst) == 1)
    def ids(dir: String) = TxTable.snapshot(spark, dir)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    // the clone sees the source's rows (incl. its DV) with no copy
    assert(ids(dst) == (1L to 11L).toSet)
    assert(graft.operators.TxTable.liveFiles(dst).forall(_.startsWith("/")),
      "a shallow clone's first commit references files absolutely")
    // copy-on-write: deleting on the clone rewrites INTO the clone,
    // the source is untouched
    TxTable.commitDelete(spark, dst, col("id") <= 3L)
    assert(ids(dst) == (4L to 11L).toSet)
    assert(ids(src) == (1L to 11L).toSet, "source must be untouched")
    // appends land locally; vacuum on the clone never deletes
    // source-owned (absolute) files
    TxTable.commitAppend(Seq((100L, "x")).toDF("id", "s"), dst)
    TxTable.commitCompact(spark, dst, targetFiles = 1) // localizes all
    assert(TxTable.liveFiles(dst).forall(!_.startsWith("/")),
      "compaction localizes the clone")
    TxTable.vacuum(dst, retainFrom = TxTable.currentVersion(dst))
    assert(ids(src) == (1L to 11L).toSet,
      "vacuum on the clone must not reach into the source")
    assert(ids(dst) == (4L to 11L).toSet + 100L)
    ()
  }

  test("r13 advice fixes: DV checkpoint sidecar, overlapping-DV feed, clone metadata, staged validation") {
    // (1) dvRefsAt rides the checkpoint sidecar: after the ckpt at
    // v10, resolution must need NOTHING before it — proven by
    // deleting the pre-checkpoint JSON entries outright
    val dir1 = java.nio.file.Files.createTempDirectory("tx-r13-ckpt-")
      .toString
    TxTable.commitAppend(
      (1L to 20L).map(i => (i, s"s$i")).toDF("id", "s").repartition(2),
      dir1) // v1
    TxTable.commitDeleteDV(spark, dir1, col("id") % 5 === 0) // v2
    (3 to 10).foreach { v =>
      TxTable.commitAppend(Seq((100L + v, "x")).toDF("id", "s"), dir1)
    } // v3..v10 — the v10 checkpoint carries the DV sidecar
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      dir1, "_txlog", "ckpt-v00010", "_dvrefs.json")))
    TxTable.commitAppend(Seq((111L, "x")).toDF("id", "s"), dir1) // v11
    def ids1() = TxTable.snapshot(spark, dir1)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val expect1 = (1L to 20L).filterNot(_ % 5 == 0).toSet ++
      (103L to 111L)
    assert(ids1() == expect1)
    (1 to 10).foreach { v =>
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(dir1, "_txlog", f"v$v%05d.json"))
    }
    assert(ids1() == expect1,
      "snapshot must resolve files AND DV state from ckpt + suffix only")

    // (2) two DVs recording the SAME (file, pos) — the overlapping
    // concurrent-delete shape — must emit the delete at the FIRST
    // version only (signed consumers would over-retract otherwise)
    val dir2 = java.nio.file.Files.createTempDirectory("tx-r13-dvdup-")
      .toString
    TxTable.commitAppend(
      (1L to 10L).map(i => (i, s"s$i")).toDF("id", "s").repartition(1),
      dir2) // v1
    TxTable.commitDeleteDV(spark, dir2, col("id") === 3L) // v2
    val log2 = java.nio.file.Paths.get(dir2, "_txlog")
    val dvDir = java.nio.file.Files.list(log2).iterator()
    val firstDv = {
      import scala.jdk.CollectionConverters._
      dvDir.asScala.map(_.getFileName.toString)
        .filter(_.startsWith("dv-")).toSeq.head
    }
    val dup = log2.resolve("dv-overlap")
    java.nio.file.Files.createDirectories(dup)
    locally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(log2.resolve(firstDv)).iterator().asScala
        .foreach { f =>
          java.nio.file.Files.copy(f, dup.resolve(f.getFileName.toString))
          ()
        }
    }
    TxTable.writeEntry(dir2,
      TxTable.Entry(3, Nil, Nil, dvs = Seq("dv-overlap"))) // v3 overlaps
    assert(TxTable.snapshot(spark, dir2).count() == 9)
    val feed2 = TxTable.changes(spark, dir2, 1)
      .select(col("_commit_version"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(feed2 == Set((2L, 3L)),
      s"the overlapping DV must not re-emit the delete: $feed2")

    // (3) a shallow clone inherits CHECK constraints and stats
    // sidecars (skipping keeps pruning the inherited files, through
    // the clone's own vacuum)
    val root3 = java.nio.file.Files.createTempDirectory("tx-r13-clone-")
      .toString
    val (src3, dst3) = (s"$root3/src", s"$root3/dst")
    TxTable.addCheckConstraint(spark, src3, "id_pos", "id > 0")
    TxTable.commitAppend(
      (1L to 20L).map(i => (i, s"s$i")).toDF("id", "s")
        .repartitionByRange(4, col("id")),
      src3, statsCols = Seq("id"))
    TxTable.cloneShallow(spark, src3, dst3)
    intercept[TxTable.ConstraintViolationException] {
      TxTable.commitAppend(Seq((-1L, "bad")).toDF("id", "s"), dst3)
    }
    val (_, skipped3) = TxTable.pruneFiles(spark, dst3, col("id") === 1L)
    assert(skipped3.size == 3,
      s"clone must prune via inherited stats, skipped $skipped3")
    TxTable.vacuum(dst3, retainFrom = 1)
    val (_, skipped3b) = TxTable.pruneFiles(spark, dst3, col("id") === 1L)
    assert(skipped3b.size == 3,
      "the clone's vacuum must keep the inherited sidecars")

    // (4) a rejected commit validates the STAGED bytes and leaves no
    // stage behind — no version, no orphan data dir
    val dir4 = java.nio.file.Files.createTempDirectory("tx-r13-stage-")
      .toString
    TxTable.addCheckConstraint(spark, dir4, "id_pos", "id > 0")
    intercept[TxTable.ConstraintViolationException] {
      TxTable.commitAppend(
        Seq((1L, "ok"), (-1L, "bad")).toDF("id", "s"), dir4)
    }
    assert(TxTable.currentVersion(dir4) == 0)
    val data4 = java.nio.file.Paths.get(dir4, "data")
    val leftover = if (!java.nio.file.Files.isDirectory(data4)) 0
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(data4).iterator().asScala.size
      }
    assert(leftover == 0, "a rejected commit must clean its stage")
    ()
  }

  test("protocol versioning: implicit v1 reads unchanged, DV auto-upgrade, doctored future log fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("tx-r13-proto-")
      .toString
    val rows = (1L to 10L).map(i => (i, s"s$i")).toDF("id", "s")
    TxTable.commitAppend(rows.repartition(2), dir) // v1
    // a pre-protocol table is implicitly 1/1 and fully usable
    assert(TxTable.protocolAt(dir) == TxTable.Protocol(1, 1))
    // the FIRST DV delete upgrades the protocol in the SAME commit
    assert(TxTable.commitDeleteDV(spark, dir, col("id") === 5L) == 2)
    val p2 = TxTable.protocolAt(dir)
    assert(p2.minReader == 2 && p2.minWriter == 2 &&
      p2.readerFeatures.contains("deletion-vectors"))
    assert(TxTable.snapshot(spark, dir).count() == 9)
    // a SECOND DV delete does not re-record the protocol
    TxTable.commitDeleteDV(spark, dir, col("id") === 6L) // v3
    // explicit upgrade is monotone (union, never downgrade) and is
    // itself a metadata commit
    val v4 = TxTable.upgradeProtocol(dir, 1, 2,
      writerFeatures = Set("check-constraints"))
    assert(v4 == 4)
    val p4 = TxTable.protocolAt(dir)
    assert(p4.minReader == 2, "upgrade must never downgrade")
    assert(p4.writerFeatures.contains("check-constraints") &&
      p4.writerFeatures.contains("deletion-vectors"))
    // a writer-only future feature blocks writes but NOT reads
    TxTable.writeEntry(dir, TxTable.Entry(5, Nil, Nil,
      dataChange = false, protocol = Some(p4.upgradedWith(2, 3,
        Set.empty, Set("exotic-writer")))))
    assert(TxTable.snapshot(spark, dir).count() == 8)
    intercept[TxTable.UnsupportedProtocolException] {
      TxTable.commitAppend(rows.limit(1), dir)
    }
    intercept[TxTable.UnsupportedProtocolException] {
      TxTable.commitDelete(spark, dir, col("id") === 1L)
    }
    // a doctored FUTURE reader version fails loudly on read AND write
    TxTable.writeEntry(dir, TxTable.Entry(6, Nil, Nil,
      dataChange = false,
      protocol = Some(TxTable.Protocol(9, 9, Set("time-crystals")))))
    intercept[TxTable.UnsupportedProtocolException] {
      TxTable.snapshot(spark, dir).count()
    }
    intercept[TxTable.UnsupportedProtocolException] {
      TxTable.commitAppend(rows.limit(1), dir)
    }
    intercept[TxTable.UnsupportedProtocolException] {
      TxTable.vacuum(dir, 1)
    }
    // the protocol rides the checkpoint sidecar: a table whose ckpt
    // records 2/2+dv still gates correctly with the JSON prefix gone
    val dir2 = java.nio.file.Files.createTempDirectory("tx-r13-proto2-")
      .toString
    TxTable.commitAppend(rows.repartition(1), dir2) // v1
    TxTable.commitDeleteDV(spark, dir2, col("id") === 1L) // v2
    (3 to 10).foreach { v =>
      TxTable.commitAppend(Seq((100L + v, "x")).toDF("id", "s"), dir2)
    } // ckpt at v10
    (1 to 9).foreach { v =>
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(dir2, "_txlog", f"v$v%05d.json"))
    }
    val pCkpt = TxTable.protocolAt(dir2)
    assert(pCkpt.minReader == 2 &&
      pCkpt.readerFeatures.contains("deletion-vectors"),
      s"protocol must survive through the sidecar: $pCkpt")
    ()
  }

  test("column mapping: rename/drop are metadata commits, time travel keeps old names, stats prune renamed columns") {
    val dir = java.nio.file.Files.createTempDirectory("tx-r13-cm-")
      .toString
    TxTable.commitAppend(
      (1L to 20L).map(i => (i, s"s$i")).toDF("id", "s")
        .repartitionByRange(4, col("id")),
      dir, statsCols = Seq("id")) // v1
    val filesV1 = TxTable.liveFiles(dir).toSet
    // v2: RENAME id -> doc_id — zero data movement, protocol upgraded
    assert(TxTable.renameColumn(spark, dir, "id", "doc_id") == 2)
    assert(TxTable.liveFiles(dir).toSet == filesV1,
      "a rename must not touch the file set")
    assert(TxTable.snapshot(spark, dir).columns.toSeq ==
      Seq("doc_id", "s"))
    assert(TxTable.protocolAt(dir).readerFeatures
      .contains("column-mapping"))
    // time travel resolves the OLD name at the old version
    assert(TxTable.snapshot(spark, dir, Some(1)).columns.toSeq ==
      Seq("id", "s"))
    // stats written under the PHYSICAL name keep pruning the RENAMED
    // logical column
    val (_, skipped) = TxTable.pruneFiles(spark, dir,
      col("doc_id") === 1L)
    assert(skipped.size == 3, s"expected 3 skipped, got $skipped")
    assert(TxTable.snapshotWhere(spark, dir, col("doc_id") === 1L)
      .count() == 1)
    // v3: appends AFTER the rename write the stable physical name
    TxTable.commitAppend(Seq((100L, "x")).toDF("doc_id", "s"), dir)
    assert(TxTable.snapshot(spark, dir).count() == 21)
    // v4: DROP s — hidden immediately, no rewrite
    val before4 = TxTable.liveFiles(dir).toSet
    assert(TxTable.dropColumn(spark, dir, "s") == 4)
    assert(TxTable.liveFiles(dir).toSet == before4)
    assert(TxTable.snapshot(spark, dir).columns.toSeq == Seq("doc_id"))
    assert(TxTable.snapshot(spark, dir, Some(3)).columns.toSeq ==
      Seq("doc_id", "s"), "time travel keeps the dropped column")
    assert(TxTable.snapshot(spark, dir, Some(1)).columns.toSeq ==
      Seq("id", "s"))
    // rewriting DELETE under the logical name
    TxTable.commitDelete(spark, dir, col("doc_id") % 2 === 0L) // v5
    val ids5 = TxTable.snapshot(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(ids5 == (1L to 20L).filterNot(_ % 2 == 0).toSet)
    // CDF across the rename window speaks the current names
    val feed = TxTable.changes(spark, dir, 4)
    assert(feed.columns.contains("doc_id"))
    assert(feed.filter(col("_change_type") === "delete").count() == 11)
    // name-collision guards: a new column may not shadow a physical
    // name in use
    intercept[IllegalArgumentException] {
      TxTable.commitAppend(Seq((1L, "y")).toDF("doc_id", "s"), dir)
    }
    intercept[IllegalArgumentException] {
      TxTable.renameColumn(spark, dir, "doc_id", "s")
    }
    intercept[IllegalArgumentException] {
      TxTable.renameColumn(spark, dir, "missing", "x")
    }
    // renaming BACK to the original (its own physical) is legal
    TxTable.renameColumn(spark, dir, "doc_id", "id")
    assert(TxTable.snapshot(spark, dir).columns.toSeq == Seq("id"))
    TxTable.renameColumn(spark, dir, "id", "doc_id")
    // OPTIMIZE localizes the logical view; content unchanged
    TxTable.commitCompact(spark, dir, targetFiles = 1)
    assert(TxTable.snapshot(spark, dir)
      .collect().map(_.getLong(0)).toSet == ids5)
    assert(TxTable.snapshot(spark, dir).columns.toSeq == Seq("doc_id"))
    // UPDATE under the logical name
    TxTable.commitUpdate(spark, dir, col("doc_id") === 1L,
      Seq("doc_id" -> lit(1000L)))
    assert(TxTable.snapshot(spark, dir)
      .collect().map(_.getLong(0)).toSet == ids5 - 1L + 1000L)
    ()
  }

  test("partitioned append: hive layout, partition pruning, columns kept in data") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-part-")
      .toString
    val df = Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"),
      (4L, "fr", "d"), (5L, "de", "e")).toDF("id", "lang", "s")
    TxTable.commitAppend(df, dir, partitionBy = Seq("lang"))
    // layout: every file sits under a __p_lang=<v> directory and the
    // data files KEEP the lang column (self-contained files)
    val files = TxTable.liveFiles(dir)
    assert(files.nonEmpty && files.forall(_.contains("/__p_lang=")))
    assert(TxTable.partitionValuesOf(files.head).contains("lang"))
    val snap = TxTable.snapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("id", "lang", "s"))
    assert(snap.count() == 5)
    // partition pruning with NO stats sidecars: lang = 'de' keeps only
    // the de file(s); result always == full filter
    val (kept, skipped) = TxTable.pruneFiles(spark, dir,
      col("lang") === "de")
    assert(kept.forall(_.contains("__p_lang=de")) && skipped.nonEmpty)
    assert(TxTable.snapshotWhere(spark, dir, col("lang") === "de")
      .select(col("id")).collect().map(_.getLong(0)).toSet == Set(3L, 5L))
    // IN / OR / mixed-AND prune too (via the statsPredicate rules)
    val (k2, _) = TxTable.pruneFiles(spark, dir,
      col("lang").isin("en", "fr"))
    assert(k2.forall(f => f.contains("=en") || f.contains("=fr")))
    val (k3, s3) = TxTable.pruneFiles(spark, dir,
      col("lang") === "de" && col("s") =!= "zz")
    assert(k3.forall(_.contains("=de")) && s3.nonEmpty)
    // a second partitioned append accumulates per-partition files
    TxTable.commitAppend(Seq((6L, "de", "f")).toDF("id", "lang", "s"),
      dir, partitionBy = Seq("lang"))
    assert(TxTable.snapshotWhere(spark, dir, col("lang") === "de")
      .count() == 3)
    // values with path-hostile characters round-trip (hive %xx escape)
    TxTable.commitAppend(
      Seq((7L, "x=1/y 2", "g")).toDF("id", "lang", "s"),
      dir, partitionBy = Seq("lang"))
    assert(TxTable.snapshotWhere(spark, dir, col("lang") === "x=1/y 2")
      .select(col("id")).collect().map(_.getLong(0)).toSet == Set(7L))
    // null partition values land in the hive default dir, never pruned
    // wrongly, and read back as NULL
    TxTable.commitAppend(
      Seq((8L, null.asInstanceOf[String], "h")).toDF("id", "lang", "s"),
      dir, partitionBy = Seq("lang"))
    assert(TxTable.snapshot(spark, dir).filter(col("lang").isNull)
      .select(col("id")).collect().map(_.getLong(0)).toSet == Set(8L))
    // reserved prefix is rejected
    intercept[IllegalArgumentException] {
      TxTable.commitAppend(
        Seq((9L, "en")).toDF("id", "__p_lang"), dir,
        partitionBy = Seq("__p_lang"))
    }
    ()
  }

  test("metadata-only DELETE: whole-partition drop stages nothing, CDF exact") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-mdel-")
      .toString
    val df = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "fr"))
      .toDF("id", "lang")
    TxTable.commitAppend(df, dir, partitionBy = Seq("lang"))
    val before = TxTable.liveFiles(dir).toSet
    // DELETE a whole partition: the commit must REMOVE files and ADD
    // none (no scan of the dropped data, no rewrite)
    val v = TxTable.commitDelete(spark, dir, col("lang") === "en")
    val h = TxTable.history(dir).find(_._1 == v).get
    assert(h._2 == 0, s"metadata-only delete staged ${h._2} file(s)")
    assert(h._3 > 0)
    val after = TxTable.liveFiles(dir).toSet
    assert(after.subsetOf(before) && after.forall(!_.contains("=en")))
    assert(TxTable.snapshot(spark, dir)
      .select(col("id")).collect().map(_.getLong(0)).toSet == Set(3L, 4L))
    // the change feed reports exactly the dropped partition's rows
    val feed = TxTable.changes(spark, dir, fromVersion = v - 1)
      .filter(col("_commit_version") === v)
      .select(col("_change_type"), col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed == Set(("delete", 1L), ("delete", 2L)))
    // a DV-hidden row is NOT re-reported when its partition drops
    TxTable.commitDeleteDV(spark, dir, col("id") === 3L)
    val v2 = TxTable.commitDelete(spark, dir, col("lang") === "de")
    assert(TxTable.history(dir).find(_._1 == v2).get._2 == 0)
    val feed2 = TxTable.changes(spark, dir, fromVersion = v2 - 1)
      .filter(col("_commit_version") === v2).collect()
    assert(feed2.isEmpty) // id=3 was already deleted by the DV
    // mixed predicate (partition + data column) falls back to the
    // scan path and stays exact
    TxTable.commitAppend(Seq((5L, "it"), (6L, "it")).toDF("id", "lang"),
      dir, partitionBy = Seq("lang"))
    val v3 = TxTable.commitDelete(spark, dir,
      col("lang") === "it" && col("id") === 5L)
    assert(TxTable.history(dir).find(_._1 == v3).get._2 > 0) // rewrite
    assert(TxTable.snapshot(spark, dir)
      .select(col("id")).collect().map(_.getLong(0)).toSet == Set(4L, 6L))
    // the rewrite re-landed its survivors UNDER their partition dirs
    // (a bare re-stage would silently strip pruning from them)
    assert(TxTable.liveFiles(dir).forall(_.contains("/__p_lang=")))
    // non-deterministic predicates never take the metadata path
    val v4 = TxTable.commitDelete(spark, dir,
      col("lang") === "fr" && rand() >= -1.0)
    assert(TxTable.history(dir).find(_._1 == v4).get._2 == 0 ||
      TxTable.snapshot(spark, dir).filter(col("lang") === "fr").count() == 0)
    ()
  }

  test("replaceWhere: atomic partition overwrite, input validation, survivors") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-rw-")
      .toString
    TxTable.commitAppend(
      Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "de", 30L))
        .toDF("id", "lang", "x"),
      dir, partitionBy = Seq("lang"))
    // input rows violating the predicate abort BEFORE anything lands
    val pre = TxTable.currentVersion(dir)
    intercept[IllegalArgumentException] {
      TxTable.commitReplaceWhere(spark, dir, col("lang") === "de",
        Seq((9L, "en", 90L)).toDF("id", "lang", "x"))
    }
    assert(TxTable.currentVersion(dir) == pre)
    // whole-partition overwrite: metadata-only remove + new adds
    val v = TxTable.commitReplaceWhere(spark, dir, col("lang") === "de",
      Seq((7L, "de", 70L)).toDF("id", "lang", "x"),
      partitionBy = Seq("lang"))
    assert(TxTable.snapshot(spark, dir)
      .select(col("id")).collect().map(_.getLong(0)).toSet == Set(1L, 7L))
    // time travel still sees the pre-overwrite rows
    assert(TxTable.snapshot(spark, dir, Some(pre))
      .select(col("id")).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
    // CDF: net change = de rows swapped
    val feed = TxTable.changes(spark, dir, fromVersion = v - 1)
      .select(col("_change_type"), col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed == Set(("delete", 2L), ("delete", 3L), ("insert", 7L)))
    // non-partition predicate: survivors of partially-matching files
    // re-land beside the new rows in ONE commit
    TxTable.commitAppend(
      Seq((10L, "fr", 1L), (11L, "fr", 2L)).toDF("id", "lang", "x")
        .coalesce(1), dir)
    TxTable.commitReplaceWhere(spark, dir, col("x") === 1L,
      Seq((12L, "fr", 1L)).toDF("id", "lang", "x"))
    assert(TxTable.snapshot(spark, dir)
      .select(col("id")).collect().map(_.getLong(0)).toSet ==
      Set(1L, 7L, 11L, 12L))
    ()
  }

  test("partitioned tables: vacuum keeps live stages; OPTIMIZE/purge/merge preserve layout; insert-only MERGE appends") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-pfix-")
      .toString
    TxTable.commitAppend(
      Seq((1L, "en"), (2L, "de"), (3L, "fr")).toDF("id", "lang"),
      dir, partitionBy = Seq("lang"), statsCols = Seq("id"))
    // vacuum on a freshly partitioned table: the live stage (3-segment
    // add paths) must NOT be classified as an orphan — this crashed
    // with DirectoryNotEmptyException and marked the live stats
    // sidecar for deletion before the round-13 review fix
    TxTable.vacuum(dir, retainFrom = 1)
    assert(TxTable.snapshot(spark, dir).count() == 3)
    val (k0, s0) = TxTable.pruneFiles(spark, dir, col("id") === 2L)
    assert(s0.nonEmpty, "stats sidecar must survive the vacuum")
    // full OPTIMIZE re-lands rows under their partition dirs
    TxTable.commitCompact(spark, dir, targetFiles = 1)
    assert(TxTable.liveFiles(dir).forall(_.contains("/__p_lang=")))
    assert(TxTable.snapshotWhere(spark, dir, col("lang") === "de")
      .count() == 1)
    // clusterBy/zOrderBy on a partitioned table is rejected loudly
    intercept[IllegalArgumentException] {
      TxTable.commitCompact(spark, dir, targetFiles = 1,
        clusterBy = Seq("id"))
    }
    // REORG APPLY PURGE preserves the layout too
    TxTable.commitDeleteDV(spark, dir, col("id") === 1L)
    TxTable.commitPurgeDVs(spark, dir)
    assert(TxTable.liveFiles(dir).forall(_.contains("/__p_lang=")))
    assert(TxTable.snapshot(spark, dir).count() == 2)
    // key-MERGE survivors re-land partitioned
    TxTable.commitMerge(spark, dir,
      Seq((2L, "de2"), (9L, "it")).toDF("id", "lang"), "id")
    assert(TxTable.liveFiles(dir).forall(_.contains("/__p_lang=")))
    // an INSERT-ONLY DML merge is a pure append: zero files removed,
    // no byte-identical rewrite, no conflict footprint
    val pre = TxTable.currentVersion(dir)
    val v = TxTable.commitMergeDml(spark, dir,
      Seq((9L, "xx"), (100L, "zz")).toDF("id", "lang"),
      col("id") === col("__src_id"),
      notMatched = Seq(TxTable.MergeClause("insert", None,
        Seq("id" -> col("__src_id"), "lang" -> col("__src_lang")))))
    assert(v == pre + 1)
    val h = TxTable.history(dir).find(_._1 == v).get
    assert(h._3 == 0, s"insert-only merge removed ${h._3} file(s)")
    assert(TxTable.snapshot(spark, dir).filter(col("id") === 100L)
      .count() == 1)
    assert(TxTable.snapshot(spark, dir).filter(col("lang") === "xx")
      .count() == 0) // id=9 matched: not re-inserted, not rewritten
    // vacuum after the mutations reclaims dead partitioned stages
    // without touching live ones (bottom-up empty-dir sweep);
    // rows: (2,de2), (3,fr), (9,it), (100,zz)
    TxTable.vacuum(dir, retainFrom = TxTable.currentVersion(dir))
    assert(TxTable.snapshot(spark, dir).count() == 4)
    ()
  }

  test("partitioned sweep: small files re-land under their partitions") {
    val dir = java.nio.file.Files.createTempDirectory("txtable-psw-")
      .toString
    // four tiny partitioned appends → many small per-partition files
    (0 until 4).foreach { i =>
      TxTable.commitAppend(
        Seq((i.toLong, "en"), (i + 100L, "de")).toDF("id", "lang"),
        dir, partitionBy = Seq("lang"))
    }
    val preCount = TxTable.snapshot(spark, dir).count()
    val preFiles = TxTable.liveFiles(dir).size
    val v = TxTable.commitCompactSmall(spark, dir,
      smallBytes = 10L * 1024 * 1024)
    assert(v > 4)
    val files = TxTable.liveFiles(dir)
    // fewer files, every one still under a partition dir, content same
    assert(files.size < preFiles)
    assert(files.forall(_.contains("/__p_lang=")))
    assert(TxTable.snapshot(spark, dir).count() == preCount)
    // partition pruning still works on the swept layout
    val (kept, skipped) = TxTable.pruneFiles(spark, dir,
      col("lang") === "de")
    assert(kept.forall(_.contains("=de")) && skipped.nonEmpty)
    assert(TxTable.snapshotWhere(spark, dir, col("lang") === "de")
      .count() == 4)
    ()
  }
}
