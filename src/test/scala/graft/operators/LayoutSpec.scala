package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known Morton codes)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    // z(3,5): x=011 y=101 -> y2x2 y1x1 y0x0 = 100111 = 39
    assert(got.toSeq == Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
  }

  test("zValueN generalizes: n=2 equals zValue; n=3 known codes") {
    val two = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("a"),
        Layout.zValueN(Seq(col("x"), col("y")), 16).as("b"))
      .head()
    assert(two.getLong(0) == two.getLong(1))
    // n=3: bit i of col j lands at 3i+j. (1,1,1) -> 0b111 = 7;
    // (2,0,0) -> x bit1 at position 3 -> 8; (0,0,2) -> bit1 of col2
    // at position 3*1+2=5 -> 32
    val got = Seq((1L, 1L, 1L), (2L, 0L, 0L), (0L, 0L, 2L))
      .toDF("x", "y", "z")
      .select(Layout.zValueN(
        Seq(col("x"), col("y"), col("z")), 8).as("m"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L, 8L, 32L), s"got $got")
  }

  test("zOrderedScaledN: every file owns a tight box in all three dimensions") {
    // 16x16x16 uniform grid -> 8 z-range partitions must each cover
    // well under the full extent on every axis (a linear sort would
    // give full-extent boxes on the two non-sorted axes)
    val grid = spark.range(4096).select(
      expr("id % 16").as("a"),
      expr("(id div 16) % 16").as("b"),
      expr("(id div 256) % 16").as("c"))
    // the property that matters is PRUNING POWER: how many partition
    // boxes admit an equality on a non-leading axis. (Per-box width
    // is not it: a SAMPLED range boundary can straddle two octants
    // and legally span one axis fully.) Under z-order some partitions
    // sit wholly in the other half of axis b / axis c and must be
    // prunable; under a linear sort on `a`, EVERY partition spans the
    // full b and c extents and nothing prunes.
    def admitting(df: org.apache.spark.sql.DataFrame,
        axis: String, v: Long): Long =
      df.withColumn("pid", spark_partition_id())
        .groupBy(col("pid"))
        .agg(min(col(axis)).as("mn"), max(col(axis)).as("mx"))
        .filter(col("mn") <= v && col("mx") >= v)
        .count()
    val z = Layout.zOrderedScaledN(grid, Seq("a", "b", "c"),
      numFiles = 8, bits = 4).cache()
    val linear = grid.repartitionByRange(8, col("a")).cache()
    assert(admitting(linear, "b", 3L) == 8 &&
      admitting(linear, "c", 12L) == 8,
      "control: the linear layout must admit everywhere")
    assert(admitting(z, "b", 3L) <= 6,
      "z-order must let a b-equality prune partitions")
    assert(admitting(z, "c", 12L) <= 6,
      "z-order must let a c-equality prune partitions")
    z.unpersist(); linear.unpersist()
    ()
  }

  test("zValue is monotone under coordinate domination") {
    // if x1 <= x2 and y1 <= y2 (not both equal) then z1 < z2 is NOT
    // guaranteed in general, but it IS along each axis with the other
    // fixed — the property that makes min/max pruning sound per axis
    val df = spark.range(64).select(col("id").as("x"))
    val z = df.select(col("x"), Layout.zValue(col("x"), lit(7L)).as("z"))
      .orderBy("x").collect().map(_.getLong(1))
    assert(z.sliding(2).forall(p => p(0) < p(1)))
  }

  test("zOrdered clustering shrinks per-partition bounding boxes") {
    // uniform 256x256 grid: every z-range partition should cover a
    // small sub-rectangle of the space in BOTH dimensions — the
    // locality that makes per-file min/max stats prune on either key
    // (a linear sort by x alone would leave every partition spanning
    // the full y range)
    val grid = spark.range(256L * 256)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val clustered = Layout.zOrdered(grid, "x", "y", numFiles = 16, bits = 8)
    def lv(r: org.apache.spark.sql.Row, i: Int): Double =
      r.getAs[Number](i).longValue().toDouble
    val boxes = clustered
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect()
    assert(boxes.length > 8)
    // what distinguishes z-order from a linear sort on x is that BOTH
    // spans stay bounded: a linear sort leaves every partition spanning
    // the full 256 of y. A z-range straddling a power-of-two quadrant
    // boundary legitimately goes wide in one dim (curve-jump worst
    // case), so pin the TYPICAL box: >= 3/4 of partitions confined to
    // a half-space in BOTH dimensions
    val maxSpans = boxes.map(r =>
      math.max(lv(r, 2) - lv(r, 1), lv(r, 4) - lv(r, 3))).sorted
    assert(maxSpans(maxSpans.length * 3 / 4) <= 128,
      s"typical box spans too much: ${maxSpans.mkString(",")}")
  }

  test("compact rewrites many small files into few, preserving rows") {
    val src = java.nio.file.Files.createTempDirectory("graft-compact-src-").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-compact-dst-").toString
    spark.range(10000).selectExpr("id", "id * 2 AS v")
      .repartition(64).write.mode("overwrite").parquet(src)
    def parquetFiles(d: String) =
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(src) == 64)
    Layout.compact(spark, src, dst, targetBytes = 512L * 1024)
    assert(parquetFiles(dst) < 8, s"still ${parquetFiles(dst)} files")
    assert(spark.read.parquet(dst).agg(sum("v")).head().getLong(0) ==
      spark.read.parquet(src).agg(sum("v")).head().getLong(0))
    assert(spark.read.parquet(dst).count() == 10000)
  }

  test("zoneMap + prunedRead: files skipped, rows identical to full scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zm-").toString
    val ev = Tables(spark, sf, "events")
      .withColumn("vint", (col("value") / 64).cast("long"))
    Layout.zOrdered(ev, "user_id", "vint", numFiles = 16)
      .drop("vint", "zval")
      .write.mode("overwrite").parquet(dir)
    val zmap = Layout.zoneMap(spark, dir, Seq("user_id"))
    val nFiles = zmap.count()
    assert(nFiles == 16)
    // sf0.001 has users 0-14: a 2-user slice must not touch most files
    val (rows, read, total) = Layout.prunedRead(spark, dir, zmap,
      "user_id", 10L, 11L)
    assert(total == 16)
    assert(read <= total / 2, s"read $read of $total files")
    // skipping is exact: identical rows to the full-scan filter
    val full = spark.read.parquet(dir)
      .filter(col("user_id").between(10, 11))
    assert(rows.count() == full.count() && rows.count() > 0)
    assert(rows.agg(sum("event_id")).head().getLong(0) ==
      full.agg(sum("event_id")).head().getLong(0))
    // empty range: no files read, empty result, same schema
    val (none, r0, _) = Layout.prunedRead(spark, dir, zmap,
      "user_id", -500L, -400L)
    assert(r0 == 0 && none.count() == 0)
    assert(none.schema == full.schema)
  }

  test("zbin-partitioned layout: zone prune is DPP, no driver file list") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp-")
      .toString
    val ev = Tables(spark, sf, "events")
      .withColumn("vint", (col("value") / 64).cast("long"))
    Layout.zOrderedPartitionedWrite(ev.drop("props"), "user_id", "vint",
      dir, nBins = 16)
    // one hive partition dir per occupied zone
    val bins = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("zbin="))
    assert(bins.nonEmpty && bins.length <= 16)
    val stats = Layout.zbinStats(spark, dir, Seq("user_id"))
    assert(stats.count() == bins.length)
    // the pruned read: surviving zones reach the scan through a
    // broadcast join on the partition column — dynamic partition
    // pruning, never a collected path list
    val pruned = Layout.prunedReadDpp(spark, dir, stats,
      "user_id", 10L, 11L)
    val full = spark.read.parquet(dir)
      .filter(col("user_id").between(10, 11)).drop("zbin")
    assert(pruned.count() == full.count() && pruned.count() > 0)
    assert(pruned.agg(sum("event_id")).head().getLong(0) ==
      full.agg(sum("event_id")).head().getLong(0))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"zone prune did not plan as DPP:\n$plan")
    // file-level proof: the data scan's runtime metrics must show it
    // opened FEWER files than the table holds (sf0.001 has users
    // 0-14, so a 2-user slice survives in a minority of zones)
    val totalFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("zbin="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
    val scanned = scans(pruned.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains(dir)))
      .map(_.metrics("numFiles").value)
    assert(scanned.nonEmpty && scanned.head < totalFiles,
      s"DPP read ${scanned.headOption} of $totalFiles files")
    // contrast: the capped driver-list path at an over-cap file count
    // abandons skipping for a full scan (row-identical, but every
    // file is read) — the DPP path above is the shape with no cap
    val zmap = Layout.zoneMap(spark, dir, Seq("user_id"))
    val (_, readN, totN) = Layout.prunedRead(spark, dir, zmap,
      "user_id", 10L, 11L, maxFiles = 1)
    assert(readN == totN, "over-cap fallback should read everything")
    // empty range: zero surviving zones, empty result, same schema
    val none = Layout.prunedReadDpp(spark, dir, stats,
      "user_id", -500L, -400L)
    assert(none.count() == 0)
    assert(none.schema.fieldNames.toSet == full.schema.fieldNames.toSet)
  }

  test("bloomIndex + bloomPrunedRead: point lookups skip files, no false negatives") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bl-").toString
    // 32k ids hash-scattered over 16 files: NOT sorted by id, so
    // min/max ranges cannot prune — the bloom's home turf
    spark.range(32768)
      .select(col("id").as("k"), (col("id") * 3).as("v"))
      .repartition(16, expr("hash(k)"))
      .write.mode("overwrite").parquet(dir)
    val bidx = Layout.bloomIndex(spark, dir, "k", expectedPerFile = 4096)
    assert(bidx.count() == 16)
    // present key: found exactly, and most files skipped (1 true file
    // + ~fpp false positives)
    val (rows, read, total) = Layout.bloomPrunedRead(spark, dir, bidx, "k", 12345L)
    assert(total == 16)
    assert(read <= 4, s"bloom read $read of $total files")
    val got = rows.collect()
    assert(got.length == 1 && got.head.getLong(1) == 12345L * 3)
    // absent key: empty result, near-zero files touched
    val (none, readA, _) = Layout.bloomPrunedRead(spark, dir, bidx, "k", -99L)
    assert(none.count() == 0 && readA <= 4)
  }

  test("distributed prune path: maxFiles cap falls back to a row-identical full scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cap-").toString
    val ev = Tables(spark, sf, "events")
      .withColumn("vint", (col("value") / 64).cast("long"))
    Layout.zOrdered(ev, "user_id", "vint", numFiles = 16)
      .drop("vint", "zval")
      .write.mode("overwrite").parquet(dir)
    val zmap = Layout.zoneMap(spark, dir, Seq("user_id"))
    val full = spark.read.parquet(dir)
      .filter(col("user_id").between(10, 11))
    // cap of 0: every survivor trips the cap — the read degrades to
    // the plain directory scan (filesRead == filesTotal) and stays
    // row-identical; the driver never holds a path list at all
    val (rows, read, total) = Layout.prunedRead(spark, dir, zmap,
      "user_id", 10L, 11L, maxFiles = 0)
    assert(read == total)
    assert(rows.count() == full.count() && rows.count() > 0)
    assert(rows.agg(sum("event_id")).head().getLong(0) ==
      full.agg(sum("event_id")).head().getLong(0))
    // same contract on the bloom path
    val bidx = Layout.bloomIndex(spark, dir, "event_id",
      expectedPerFile = 4096)
    val probe = Tables(spark, sf, "events").select("event_id")
      .head().getLong(0)
    val (brows, bread, btotal) = Layout.bloomPrunedRead(spark, dir,
      bidx, "event_id", probe, maxFiles = 0)
    assert(bread == btotal)
    assert(brows.count() ==
      spark.read.parquet(dir).filter(col("event_id") === probe).count())
    // and the uncapped bloom path still prunes: the surviving-path
    // collect is bounded by matches + fpp·files, never O(files)
    val (_, read2, total2) = Layout.bloomPrunedRead(spark, dir,
      bidx, "event_id", probe)
    assert(read2 < total2)
  }

  test("zoneMapAppend: incremental stats, replay-idempotent, pruning exact") {
    val dataDir = java.nio.file.Files.createTempDirectory("graft-zma-d-").toString
    val statsDir = java.nio.file.Files.createTempDirectory("graft-zma-s-").toString
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id").as("event_id"),
        (col("id") % 20).as("user_id"), (col("id") * 2).as("value"))
    // three appends, disjoint id ranges
    Layout.zoneMapAppend(spark, batch(0, 100), dataDir, statsDir, 0, Seq("user_id"))
    Layout.zoneMapAppend(spark, batch(100, 200), dataDir, statsDir, 1, Seq("user_id"))
    Layout.zoneMapAppend(spark, batch(200, 300), dataDir, statsDir, 2, Seq("user_id"))
    val zmap = Layout.zoneMapRead(spark, statsDir)
    assert(spark.read.parquet(dataDir).count() == 300)
    assert(zmap.agg(sum("n")).head().getLong(0) == 300)
    // checkpoint replay of batch 1 rewrites its partition — no dupes
    Layout.zoneMapAppend(spark, batch(100, 200), dataDir, statsDir, 1, Seq("user_id"))
    assert(spark.read.parquet(dataDir).count() == 300)
    assert(Layout.zoneMapRead(spark, statsDir).agg(sum("n")).head().getLong(0) == 300)
    // pruned read over the maintained stats equals the plain filter
    val (rows, read, total) = Layout.prunedRead(spark, dataDir,
      Layout.zoneMapRead(spark, statsDir), "user_id", 5L, 6L)
    val full = spark.read.parquet(dataDir)
      .filter(col("user_id").between(5, 6))
    assert(rows.count() == full.count() && rows.count() > 0)
    assert(rows.agg(sum("event_id")).head().getLong(0) ==
      full.agg(sum("event_id")).head().getLong(0))
    assert(read <= total)
  }

  test("negativeSamples: deterministic, k-bounded, excludes the anchor") {
    val docs = Tables(spark, sf, "documents")
    val a = Sampling.negativeSamples(docs, "doc_id", "text",
      k = 3, nBuckets = 64).cache()
    assert(a.filter(col("neg_id") === col("anchor_id")).count() == 0)
    val perAnchor = a.groupBy("anchor_id").count().agg(max("count")).head().getLong(0)
    assert(perAnchor <= 3)
    // a dense ring (500 docs over 64 buckets) serves nearly every anchor
    assert(a.select("anchor_id").distinct().count() > docs.count() * 9 / 10)
    val b = Sampling.negativeSamples(docs.repartition(7), "doc_id", "text",
      k = 3, nBuckets = 64)
    assert(a.collect().map(_.toString).sorted.toSeq ==
      b.collect().map(_.toString).sorted.toSeq)
  }
}
