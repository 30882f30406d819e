package graft.operators

import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal transaction-log table — the lakehouse commit protocol
  * (Delta/Iceberg's core idea) reduced to its public essentials:
  * data lives as immutable parquet files under `data/`, and the ONLY
  * source of truth for which files are live is an ordered log of
  * JSON commit entries under `_txlog/` (`v00001.json`, ...), each
  * listing added and removed file names. Readers resolve the log to
  * a file list and scan exactly those files, so:
  *
  *  - commits are ATOMIC: a half-written data file is invisible
  *    until its log entry lands (the log write is the commit point —
  *    create-new-file with `CREATE_NEW`, so two racing writers of
  *    the same version cannot both succeed: optimistic concurrency);
  *  - snapshots are VERSIONED: reading "as of v" replays entries
  *    ≤ v — time travel at file granularity, no data rewritten;
  *  - deletes REWRITE ONLY AFFECTED FILES: files with no matching
  *    row survive untouched (at 100 TB a predicate delete touches
  *    the handful of files whose zone a match lands in, not the
  *    table).
  *
  * The log itself is driver-side JSON — bounded by commit count, the
  * same trade Delta makes; everything row-shaped stays distributed.
  */
object TxTable {

  private def logDir(dir: String) = Paths.get(dir, "_txlog")
  private def dataDir(dir: String) = Paths.get(dir, "data")

  private final case class Entry(version: Int, adds: Seq[String],
      removes: Seq[String])

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  private def writeEntry(dir: String, e: Entry): Unit = {
    Files.createDirectories(logDir(dir))
    val json = s"""{"version":${e.version},""" +
      s""""adds":[${e.adds.map(a => "\"" + esc(a) + "\"").mkString(",")}],""" +
      s""""removes":[${e.removes.map(r => "\"" + esc(r) + "\"").mkString(",")}]}"""
    // CREATE_NEW is the commit point: the version file either appears
    // fully or the commit fails — a concurrent writer of the same
    // version loses with FileAlreadyExistsException
    Files.write(logDir(dir).resolve(f"v${e.version}%05d.json"),
      json.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
    ()
  }

  private def readEntries(dir: String): Seq[Entry] = {
    if (!Files.isDirectory(logDir(dir))) return Seq.empty
    val files = Files.list(logDir(dir)).iterator().asScala
      .filter(_.toString.endsWith(".json")).toSeq.sortBy(_.toString)
    files.map { p =>
      val s = new String(Files.readAllBytes(p), "UTF-8")
      def arr(key: String): Seq[String] = {
        val i = s.indexOf("\"" + key + "\":[")
        val j = s.indexOf(']', i)
        val body = s.substring(i + key.length + 4, j)
        if (body.trim.isEmpty) Seq.empty
        else body.split(",").toSeq
          .map(_.trim.stripPrefix("\"").stripSuffix("\"")
            .replace("\\\"", "\"").replace("\\\\", "\\"))
      }
      val v = s.substring(s.indexOf("\"version\":") + 10)
        .takeWhile(_.isDigit).toInt
      Entry(v, arr("adds"), arr("removes"))
    }.sortBy(_.version)
  }

  /** Current highest committed version (0 = empty table). */
  def currentVersion(dir: String): Int =
    readEntries(dir).lastOption.map(_.version).getOrElse(0)

  /** Live data-file names as of `version` (None = latest). */
  def liveFiles(dir: String, version: Option[Int] = None): Seq[String] = {
    val upTo = readEntries(dir)
      .filter(e => version.forall(e.version <= _))
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    upTo.foreach { e => live ++= e.adds; live --= e.removes }
    live.toSeq
  }

  /** Append `df` as a new commit: data files land first (invisible),
    * the log entry makes them live.
    */
  def commitAppend(df: DataFrame, dir: String): Int = {
    val v = currentVersion(dir) + 1
    val stage = dataDir(dir).resolve(f"v$v%05d").toString
    df.write.mode("overwrite").parquet(stage)
    val added = Files.list(Paths.get(stage)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet")).toSeq.sorted
      .map(n => f"v$v%05d/$n")
    writeEntry(dir, Entry(v, added, Seq.empty))
    v
  }

  /** Predicate delete: rewrite ONLY the files containing a matching
    * row; untouched files stay live under their old names. Surviving
    * rows of affected files re-land as this commit's adds.
    */
  def commitDelete(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column): Int = {
    val v = currentVersion(dir) + 1
    val files = liveFiles(dir)
    val base = dataDir(dir).toString
    // which files hold a matching row? one distributed scan
    val withFile = spark.read.parquet(files.map(f => s"$base/$f"): _*)
      .withColumn("_f", input_file_name())
    val affectedPaths = withFile.filter(pred)
      .select(col("_f")).distinct().collect().map(_.getString(0)).toSet
    val affected = files.filter(f => affectedPaths.exists(_.endsWith(f)))
    if (affected.isEmpty) return currentVersion(dir)
    val stage = dataDir(dir).resolve(f"v$v%05d").toString
    spark.read.parquet(affected.map(f => s"$base/$f"): _*)
      .filter(!pred)
      .write.mode("overwrite").parquet(stage)
    val added = Files.list(Paths.get(stage)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSeq.sorted
      .map(n => f"v$v%05d/$n")
    writeEntry(dir, Entry(v, added, affected))
    v
  }

  /** Idempotent append at an EXPLICIT version — the exactly-once
    * streaming-sink protocol: `foreachBatch` maps micro-batch N to
    * version base+N+1; on restart a replayed batch finds its version
    * file already committed and becomes a no-op, so the table sees
    * every batch exactly once no matter how often the stream retries
    * (the IdempotentSink contract at file granularity). Returns true
    * if this call committed, false if the version already existed.
    */
  def commitAppendAt(df: DataFrame, dir: String, version: Int): Boolean = {
    if (Files.exists(logDir(dir).resolve(f"v$version%05d.json")))
      return false
    val stage = dataDir(dir).resolve(f"v$version%05d").toString
    df.write.mode("overwrite").parquet(stage)
    val added = Files.list(Paths.get(stage)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSeq.sorted
      .map(n => f"v$version%05d/$n")
    try { writeEntry(dir, Entry(version, added, Seq.empty)); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }

  /** MERGE (upsert) commit: source rows REPLACE same-key rows, new
    * keys append — one commit. Only files containing a matched key
    * are rewritten (their unmatched rows re-land beside the full
    * source); every other file survives untouched, so merge cost
    * rides |affected files|, not table size.
    */
  def commitMerge(spark: SparkSession, dir: String, source: DataFrame,
      keyCol: String): Int = {
    val v = currentVersion(dir) + 1
    val files = liveFiles(dir)
    val base = dataDir(dir).toString
    val current = spark.read.parquet(files.map(f => s"$base/$f"): _*)
      .withColumn("_f", input_file_name())
    val keys = source.select(col(keyCol)).distinct()
    val affectedPaths = current
      .join(broadcast(keys), Seq(keyCol), "left_semi")
      .select(col("_f")).distinct().collect().map(_.getString(0)).toSet
    val affected = files.filter(f => affectedPaths.exists(_.endsWith(f)))
    val survivors =
      if (affected.isEmpty) source
      else spark.read.parquet(affected.map(f => s"$base/$f"): _*)
        .join(broadcast(keys), Seq(keyCol), "left_anti")
        .unionByName(source)
    val stage = dataDir(dir).resolve(f"v$v%05d").toString
    survivors.write.mode("overwrite").parquet(stage)
    val added = Files.list(Paths.get(stage)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSeq.sorted
      .map(n => f"v$v%05d/$n")
    writeEntry(dir, Entry(v, added, affected))
    v
  }

  /** Compaction commit (OPTIMIZE): rewrite the current live set into
    * `targetFiles` files and swap atomically — readers at older
    * versions still see the old files (they are removed from the
    * LOG, not the disk), so time travel survives compaction.
    */
  def commitCompact(spark: SparkSession, dir: String,
      targetFiles: Int): Int = {
    val v = currentVersion(dir) + 1
    val files = liveFiles(dir)
    val base = dataDir(dir).toString
    val stage = dataDir(dir).resolve(f"v$v%05d").toString
    spark.read.parquet(files.map(f => s"$base/$f"): _*)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(stage)
    val added = Files.list(Paths.get(stage)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSeq.sorted
      .map(n => f"v$v%05d/$n")
    writeEntry(dir, Entry(v, added, files))
    v
  }

  /** Commit history (DESCRIBE HISTORY): one row per version with add/
    * remove counts — the audit surface; driver-side, bounded by
    * commit count like the log itself.
    */
  def history(dir: String): Seq[(Int, Int, Int)] =
    readEntries(dir).map(e => (e.version, e.adds.size, e.removes.size))

  /** VACUUM: physically delete data files no longer referenced by any
    * version ≥ `retainFrom` — the storage-reclaim step that TRADES
    * AWAY time travel older than the horizon (exactly Delta's
    * contract). Files still referenced by any retained version
    * survive; returns the deleted file names.
    */
  def vacuum(dir: String, retainFrom: Int): Seq[String] = {
    val entries = readEntries(dir)
    val latest = entries.lastOption.map(_.version).getOrElse(0)
    val keep = (retainFrom to latest)
      .flatMap(v => liveFiles(dir, Some(v))).toSet
    val all = entries.flatMap(_.adds).toSet
    val dead = (all -- keep).toSeq.sorted
    dead.foreach { f =>
      Files.deleteIfExists(dataDir(dir).resolve(f)); ()
    }
    dead
  }

  /** Snapshot read as of `version` (None = latest): scan exactly the
    * live file list.
    */
  def snapshot(spark: SparkSession, dir: String,
      version: Option[Int] = None,
      mergeSchema: Boolean = false): DataFrame = {
    val files = liveFiles(dir, version)
    require(files.nonEmpty, s"no live files at version $version")
    val base = dataDir(dir).toString
    spark.read.option("mergeSchema", mergeSchema.toString)
      .parquet(files.map(f => s"$base/$f"): _*)
  }
}
