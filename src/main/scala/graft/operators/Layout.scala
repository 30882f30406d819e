package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for
  * multi-dimensional data skipping. Sorting a table by the bit
  * interleave of two key columns keeps rows close in BOTH dimensions
  * physically close, so per-file (or per-row-group) min/max statistics
  * prune scans filtered on EITHER key — the Delta/Iceberg OPTIMIZE
  * ZORDER primitive, built here from pure Catalyst bit arithmetic.
  *
  * Scale design: the z-value is a per-row codegen expression (a fixed
  * unrolled fold over `bits` bit positions — no UDF); the clustered
  * write is one `repartitionByRange` (range exchange with sampled
  * bounds) + in-partition sort. Nothing else shuffles.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer columns: bit i of `x` lands at position 2i, bit i of `y`
    * at 2i+1. With bits=16 the result fits in 32 bits.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Cluster `df` by the z-order of (xCol, yCol) into `numFiles` range
    * partitions, each sorted by z-value — write the result with any
    * file sink and min/max stats prune on both keys.
    */
  def zOrdered(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 16): DataFrame =
    df.withColumn("zval", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))

  /** Morton interleave of N non-negative integer columns: bit i of
    * column j lands at position i·N + j — the same unrolled codegen
    * fold as [[zValue]], generalized. `bits · N` must fit a long.
    */
  def zValueN(cs: Seq[Column], bits: Int): Column = {
    val n = cs.size
    require(n >= 2 && bits * n <= 62,
      s"zValueN: need >= 2 columns and bits*n <= 62, got n=$n bits=$bits")
    cs.zipWithIndex.foldLeft(lit(0L)) { case (acc0, (c, j)) =>
      val cl = c.cast("long")
      (0 until bits).foldLeft(acc0) { (acc, i) =>
        acc.bitwiseOR(
          shiftleft(shiftright(cl, i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** [[zOrderedScaled]] for N key columns (the (tenant, date, key)
    * clustering shape): each key normalized to an equal-width bucket
    * id over its own [min, max] (one broadcast one-row aggregate),
    * then range-partitioned on the N-way interleave so every file
    * owns a tight box in EVERY dimension.
    */
  def zOrderedScaledN(df: DataFrame, keyCols: Seq[String],
      numFiles: Int, bits: Int = 8): DataFrame = {
    val aggs = keyCols.zipWithIndex.flatMap { case (k, i) =>
      Seq(min(col(k)).cast("double").as(s"_zmn$i"),
        max(col(k)).cast("double").as(s"_zmx$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val n = (1 << bits).toDouble
    def bucket(v: Column, mn: Column, mx: Column): Column =
      when(mx <= mn, lit(0L)).otherwise(
        least(floor((v.cast("double") - mn) / ((mx - mn) / n)),
          lit(n - 1)).cast("long"))
    val buckets = keyCols.zipWithIndex.map { case (k, i) =>
      bucket(col(k), col(s"_zmn$i"), col(s"_zmx$i"))
    }
    val statCols = keyCols.indices.flatMap(i =>
      Seq(s"_zmn$i", s"_zmx$i"))
    df.crossJoin(broadcast(stats))
      .withColumn("zval", zValueN(buckets, bits))
      .drop(statCols: _*)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
  }

  /** [[zOrdered]] with per-dimension NORMALIZATION: each key is
    * first mapped to an equal-width bucket id in [0, 2^bits) over its
    * own [min, max], and the interleave runs on the bucket ids. Raw
    * interleaving silently degrades when the dimensions have
    * mismatched magnitudes — the wider key's high bits dominate every
    * z-boundary and the layout collapses to a one-axis sort (a
    * doc_id in the millions against a length in the hundreds makes
    * "z-order" just doc_id order). Normalizing first is what Delta's
    * OPTIMIZE ZORDER does with per-column range ids; equal-width over
    * the observed [min, max] costs ONE tiny aggregate (a one-row
    * broadcast scalar) instead of a per-column global sort, and is
    * exact for the pruning purpose — file boxes only need to be tight,
    * not equi-populated.
    */
  def zOrderedScaled(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 8): DataFrame =
    // zValueN's layout at n=2 (bit i of key j at 2i+j) IS zValue's —
    // one implementation, pinned equal in LayoutSpec
    zOrderedScaledN(df, Seq(xCol, yCol), numFiles, bits)

  /** Zone map: per-file (count, min, max) statistics for `keyCols`
    * over a parquet directory — the file-skipping index a lakehouse
    * keeps beside a z-ordered table. One narrow pass grouped by
    * `_metadata.file_path`; output is O(files) rows (the same bounded
    * driver-artifact contract as the range-boundary machinery).
    */
  def zoneMap(spark: org.apache.spark.sql.SparkSession, dir: String,
      keyCols: Seq[String]): DataFrame = {
    val aggs = keyCols.flatMap(k => Seq(
      min(col(k)).as(s"min_$k"), max(col(k)).as(s"max_$k")))
    spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("file") +:
        keyCols.map(col): _*)
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** Incremental zone-map maintenance for an append-only streamed
    * table: the micro-batch lands in its own `batch=<id>` subdirectory
    * and its per-file stats land in the matching `statsDir` partition
    * — both `overwrite`, so a replayed batch (checkpoint recovery)
    * rewrites its own partition instead of duplicating rows:
    * replay-idempotent by construction, the [[graft.streaming]]
    * versioned-state convention. The union of batch stats IS the
    * table's zone map; maintenance cost is O(batch), never a global
    * recompute over the table.
    */
  def zoneMapAppend(spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame, dataDir: String, statsDir: String,
      batchId: Long, keyCols: Seq[String]): Unit = {
    val sub = s"$dataDir/batch=$batchId"
    batch.write.mode("overwrite").parquet(sub)
    zoneMap(spark, sub, keyCols)
      .write.mode("overwrite").parquet(s"$statsDir/batch=$batchId")
  }

  /** Per-file BLOOM skipping index for point lookups — [[zoneMap]]'s
    * sibling: a min/max range answers "could this file hold this
    * span?", a bloom answers "does this file definitely NOT hold this
    * key?" — which is what prunes point lookups on a column the file
    * layout is NOT sorted by. One pass grouped by file; each file's
    * filter is a distributed `bloom_filter_agg` over xxhash64(key),
    * so the index is O(files · bloomBytes) — the bounded
    * driver-artifact contract again.
    */
  def bloomIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      keyCol: String, expectedPerFile: Long = 100000L,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftBridge.column
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val bits = math.min(8388608L, math.max(64L,
      math.ceil(-expectedPerFile * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong))
    spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("file"),
        xxhash64(col(keyCol)).as("kh"))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n"),
        column(new BloomFilterAggregate(
          org.apache.spark.sql.GraftBridge.expression(col("kh")),
          Literal(expectedPerFile), Literal(bits)).toAggregateExpression())
          .as("bloom"))
  }

  /** Point-lookup read through a [[bloomIndex]]: scan ONLY the files
    * whose bloom might contain the key (no false negatives ⇒
    * row-identical to the full-scan filter; false positives only cost
    * extra file reads at rate `fpp`). Returns (rows, filesRead,
    * filesTotal).
    *
    * Scale contract: the bloom probes run DISTRIBUTED over the stats
    * table — the driver never materializes O(files) rows, only the
    * SURVIVING paths (≈ true matches + fpp·files for a point lookup),
    * and `maxFiles` hard-caps even that: past the cap the skip is
    * abandoned for a plain full-directory scan, which is row-identical
    * by construction (skipping is purely an I/O optimization). At
    * millions of files the old collect-everything shape made the
    * driver the bottleneck twice — once in the collect, once in the
    * reader's explicit path-list planning.
    */
  def bloomPrunedRead(spark: org.apache.spark.sql.SparkSession,
      dir: String, bidx: DataFrame, keyCol: String, key: Long,
      maxFiles: Int = 65536): (DataFrame, Int, Int) = {
    val total = bidx.count().toInt
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong(key, 42L) // spark xxhash64's fixed seed
    // per-file-row bloom deserialization on executors; a UDF is fine
    // here — the input is the stats table (one row per FILE), never
    // the data itself
    val might = udf((b: Array[Byte]) => b != null &&
      org.apache.spark.util.sketch.BloomFilter.readFrom(b)
        .mightContainLong(h))
    val keep = bidx.filter(might(col("bloom"))).select(col("file"))
      .limit(maxFiles + 1).collect().map(_.getString(0))
    if (keep.length > maxFiles)
      (spark.read.parquet(dir).filter(col(keyCol) === key), total, total)
    else {
      val pruned =
        if (keep.isEmpty) spark.read.parquet(dir).filter(lit(false))
        else spark.read.parquet(keep.toIndexedSeq: _*)
      (pruned.filter(col(keyCol) === key), keep.length, total)
    }
  }

  /** The maintained zone map: union of every batch's stats. */
  def zoneMapRead(spark: org.apache.spark.sql.SparkSession,
      statsDir: String): DataFrame =
    spark.read.parquet(statsDir).drop("batch")

  /** Data-skipping read: scan ONLY the files whose zone-map range
    * [min_key, max_key] intersects [lo, hi], then apply the exact
    * predicate to the survivors. On a z-ordered table the skipped
    * fraction approaches the selectivity — the OPTIMIZE-ZORDER payoff.
    * Returns (rows, filesRead, filesTotal).
    * Row-identical to the plain full-scan filter by construction:
    * skipping only drops files the min/max proves empty for the range.
    *
    * Scale contract (same as [[bloomPrunedRead]]): the range
    * intersection is a distributed filter over the stats table; the
    * driver collects only the SURVIVING paths, `maxFiles`-capped with
    * a full-scan fallback — a selective range on a z-ordered table
    * keeps survivors near the selectivity, and a non-selective one
    * shouldn't be path-list-planned anyway.
    */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, dir: String,
      zmap: DataFrame, key: String, lo: Long, hi: Long,
      maxFiles: Int = 65536): (DataFrame, Int, Int) = {
    val total = zmap.count().toInt
    val keep = zmap
      .filter(col(s"min_$key").cast("long") <= hi &&
        col(s"max_$key").cast("long") >= lo)
      .select(col("file"))
      .limit(maxFiles + 1).collect().map(_.getString(0))
    if (keep.length > maxFiles)
      (spark.read.parquet(dir).filter(col(key).between(lo, hi)),
        total, total)
    else {
      val pruned =
        if (keep.isEmpty)
          spark.read.parquet(dir).filter(lit(false))
        else spark.read.parquet(keep.toIndexedSeq: _*)
      (pruned.filter(col(key).between(lo, hi)), keep.length, total)
    }
  }

  /** Z-ordered layout with the zone as a HIVE PARTITION column: rows
    * are range-partitioned on their z-value (sampled bounds — bins
    * stay balanced whatever the key distribution, the [[zOrdered]]
    * property) and each range becomes a `zbin=<id>/` directory, so
    * one bin = one contiguous Morton range = a tight bounding box in
    * both keys. This is the DISTRIBUTED-prune twin of
    * [[zOrdered]]+[[prunedRead]]: because the zone is a partition
    * column, pruning can ride Spark's own partition machinery instead
    * of a driver-collected file list.
    */
  def zOrderedPartitionedWrite(df: DataFrame, xCol: String,
      yCol: String, dir: String, nBins: Int = 16,
      bits: Int = 16): Unit =
    df.withColumn("zval", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(nBins, col("zval"))
      .withColumn("zbin", spark_partition_id().cast("long"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.mode("overwrite").partitionBy("zbin").parquet(dir)

  /** Per-zone (min, max, count) statistics for a
    * [[zOrderedPartitionedWrite]] layout — O(zones) rows, kept AS A
    * TABLE (write it next to the data), never a driver list.
    */
  def zbinStats(spark: org.apache.spark.sql.SparkSession, dir: String,
      keyCols: Seq[String]): DataFrame = {
    val aggs = keyCols.flatMap(k => Seq(
      min(col(k)).as(s"min_$k"), max(col(k)).as(s"max_$k")))
    spark.read.parquet(dir)
      .groupBy(col("zbin"))
      .agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** Fully DISTRIBUTED zone prune: the range test runs as a filter
    * over the stats TABLE and the surviving zones reach the scan as a
    * broadcast equi-join on the `zbin` partition column — DYNAMIC
    * PARTITION PRUNING then skips unmatched `zbin=` directories at
    * the file level (pinned in LayoutSpec). No file or zone list ever
    * rides the driver, so there is no `maxFiles` cap and no full-scan
    * fallback: this is the shape that holds at millions of files.
    * Row-identical to the plain filter by construction — min/max only
    * ever EXCLUDES zones that provably hold no match.
    */
  def prunedReadDpp(spark: org.apache.spark.sql.SparkSession,
      dir: String, stats: DataFrame, key: String, lo: Long,
      hi: Long): DataFrame = {
    val zones = stats
      .filter(col(s"min_$key").cast("long") <= hi &&
        col(s"max_$key").cast("long") >= lo)
      .select(col("zbin"))
    spark.read.parquet(dir)
      .join(broadcast(zones), Seq("zbin"))
      .filter(col(key).between(lo, hi))
      .drop("zbin")
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files (streaming sinks and incremental
    * appends accumulate kilobyte files whose per-file open/footer cost
    * eventually dominates scans — the OPTIMIZE/compact maintenance op).
    * File count is derived from on-disk bytes, floored at 1; the
    * rewrite goes to a fresh directory so a crash mid-compaction never
    * corrupts the source.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      dstDir: String, targetBytes: Long = 128L * 1024 * 1024): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val bytes = Files.walk(Paths.get(srcDir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(Files.size).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(srcDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(dstDir)
  }
}
