package graft.operators

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, StringType}

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
  *    the same version cannot both succeed: optimistic concurrency).
  *    Each attempt stages into its own UNIQUE directory
  *    (`v00007-3fa9c1d2/`), so the loser of a race can never clobber
  *    data files the winner's log entry already references — the
  *    atomicity holds for the data files, not just the log file;
  *  - a losing writer RETRIES at the next version after re-validating
  *    that the interleaved commits don't conflict with what it read
  *    (appends never conflict; remove-carrying commits conflict with
  *    interleaved commits that touch their inputs) — Delta's
  *    optimistic commit loop, so concurrent appends all land,
  *    serialized, without restaging a byte;
  *  - snapshots are VERSIONED: reading "as of v" replays entries
  *    ≤ v — time travel at file granularity, no data rewritten;
  *  - every `checkpointEvery` commits the resolved live-file set is
  *    written as a parquet CHECKPOINT (`_txlog/ckpt-v00010/`) plus a
  *    `_last_checkpoint` pointer, and snapshot resolution reads
  *    checkpoint + suffix instead of replaying every JSON entry —
  *    the term that dominates at 10⁵+ commits (Delta's
  *    `_last_checkpoint` contract);
  *  - deletes REWRITE ONLY AFFECTED FILES: files with no matching
  *    row survive untouched (at 100 TB a predicate delete touches
  *    the handful of files whose zone a match lands in, not the
  *    table). DELETE keeps every row where the predicate is NOT TRUE
  *    — under SQL three-valued logic a NULL predicate row is kept,
  *    never silently dropped (Delta/Iceberg semantics).
  *
  * The log itself is driver-side JSON — bounded by commit count and
  * checkpoint-accelerated; everything row-shaped stays distributed.
  */
object TxTable {

  /** Write a checkpoint every this many commits (Delta defaults to
    * 10; same trade: checkpoint cost amortized over resolution cost).
    */
  val DefaultCheckpointEvery = 10

  private def logDir(dir: String) = Paths.get(dir, "_txlog")
  private def dataDir(dir: String) = Paths.get(dir, "data")

  /** Resolve a log file name against the table's data dir. Names are
    * normally stage-relative; a shallow CLONE's entries reference the
    * SOURCE table's files by absolute path (Delta's shallow-clone
    * contract) and pass through untouched.
    */
  private def absPath(base: String, f: String): String =
    if (f.startsWith("/") || f.contains("://")) f else s"$base/$f"

  /** The last two path segments (`stage/part.parquet`) — the identity
    * under which scans report a file (`_metadata.file_path` suffix)
    * and deletion vectors address it. Unique across tables because
    * every stage dir carries a random token, so a clone's absolute
    * reference and a local name can never collide.
    */
  private[operators] def relSuffix(f: String): String =
    f.split('/').takeRight(2).mkString("/")

  // ---------------------------------------------------------------
  // Hive-partitioned staging (partition values live in file PATHS)
  // ---------------------------------------------------------------

  /** Partition-directory prefix. A partitioned append stages through
    * DUPLICATE write-side columns named `__p_<col>` so the hive
    * `partitionBy` writer lays files out under `__p_<col>=<value>/`
    * directories while the REAL column stays in the data file —
    * every existing read path (snapshots, DV row addressing, CDF
    * diffs, clones) keeps working on self-contained files, and the
    * path segment gives the log partition values for free: no entry
    * schema change, and checkpoints/clones carry the values because
    * they carry the paths. (Delta records partitionValues in the add
    * action and strips the columns from data files; keeping the
    * column costs a few dictionary-encoded bytes per row and buys
    * total independence from reconstitution logic — the right trade
    * for an engine whose DV/CDF/stats machinery addresses raw files.)
    */
  private val PartPrefix = "__p_"

  /** Undo the hive writer's %xx path escaping (space, '=', '/', …). */
  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Partition values carried by a file's path: every `__p_col=value`
    * segment, unescaped; the hive null marker maps to None. Files
    * staged without `partitionBy` (or re-landed by a non-partition
    * rewrite) simply have none and are never partition-pruned —
    * graceful degradation, stats skipping still applies to them.
    */
  def partitionValuesOf(f: String): Map[String, Option[String]] =
    f.split('/').iterator.filter(_.startsWith(PartPrefix)).flatMap { seg =>
      val i = seg.indexOf('=')
      if (i < 0) Iterator.empty
      else {
        val c = seg.substring(PartPrefix.length, i)
        val raw = unescapePathName(seg.substring(i + 1))
        Iterator.single(c ->
          (if (raw == "__HIVE_DEFAULT_PARTITION__") None else Some(raw)))
      }
    }.toMap

  /** One commit. `dataChange=false` marks a pure data-reorganization
    * commit (OPTIMIZE): the file set changes but no row's content or
    * liveness does — the change feed skips it entirely, exactly
    * Delta's `dataChange` flag on add/remove actions (without it a
    * compaction would force the feed to diff the whole table just to
    * prove the diff is empty).
    *
    * `dvs` names deletion-vector parquet dirs (under `_txlog/`) this
    * commit puts IN FORCE — a merge-on-read delete adds one without
    * touching a data file (Delta's deletion-vector actions).
    * `dvReset` clears every previously accumulated DV before this
    * commit's own `dvs` apply — RESTORE (reinstates the target
    * version's exact DV state) and PURGE (materializes DVs into
    * rewritten files) both carry it.
    */
  private[operators] final case class Entry(version: Int, adds: Seq[String],
      removes: Seq[String], dataChange: Boolean = true,
      dvs: Seq[String] = Nil, dvReset: Boolean = false,
      protocol: Option[Protocol] = None,
      renameFrom: Seq[String] = Nil, renameTo: Seq[String] = Nil,
      dropCols: Seq[String] = Nil,
      addColNames: Seq[String] = Nil, addColTypes: Seq[String] = Nil,
      txn: Option[(String, Long)] = None,
      ts: Long = 0L)

  /** Commit clock (millis). Injectable so tests and oracle fixtures
    * get DETERMINISTIC in-commit timestamps; production keeps the
    * wall clock. [[writeEntry]] enforces monotonicity on top
    * (Delta's in-commit-timestamp rule: ts(v) > ts(v-1) always, even
    * under clock skew between writers).
    */
  @volatile private[graft] var clock: () => Long =
    () => System.currentTimeMillis()

  /** Raised when an optimistic retry finds a real conflict (Delta's
    * `ConcurrentModificationException` contract).
    */
  final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  // ---------------------------------------------------------------
  // Log protocol versioning (Delta's minReader/minWriter contract)
  // ---------------------------------------------------------------

  /** The table's compatibility contract: an engine may READ only if
    * `minReader` ≤ its supported reader version AND it understands
    * every reader feature; it may WRITE only if it may read AND
    * `minWriter` ≤ its writer version AND it understands every writer
    * feature. Tables whose log carries no protocol record are
    * implicitly version 1/1 (the pre-protocol era reads unchanged).
    */
  final case class Protocol(minReader: Int, minWriter: Int,
      readerFeatures: Set[String] = Set.empty,
      writerFeatures: Set[String] = Set.empty) {
    def upgradedWith(mr: Int, mw: Int, rf: Set[String],
        wf: Set[String]): Protocol =
      Protocol(math.max(minReader, mr), math.max(minWriter, mw),
        readerFeatures ++ rf, writerFeatures ++ wf)
  }

  /** What THIS engine supports. Feature flags name capabilities whose
    * on-disk state an unaware engine would misread (deletion vectors:
    * silently resurrected rows) or corrupt (check constraints:
    * unvalidated appends; column mapping: physical-name writes).
    */
  val EngineProtocol: Protocol = Protocol(2, 2,
    readerFeatures = Set("deletion-vectors", "column-mapping"),
    writerFeatures = Set("deletion-vectors", "column-mapping",
      "check-constraints"))

  /** Raised when the table's protocol requires a newer engine —
    * failing LOUDLY instead of misreading is the entire point
    * (Delta's InvalidProtocolVersionException contract).
    */
  final class UnsupportedProtocolException(msg: String)
    extends RuntimeException(msg)

  private def assertReadable(dir: String, p: Protocol): Unit = {
    val unknownR = p.readerFeatures -- EngineProtocol.readerFeatures
    if (p.minReader > EngineProtocol.minReader || unknownR.nonEmpty)
      throw new UnsupportedProtocolException(
        s"table at $dir requires reader version ${p.minReader} with " +
          s"features ${p.readerFeatures.mkString(",")}; this engine " +
          s"supports ${EngineProtocol.minReader} with " +
          s"${EngineProtocol.readerFeatures.mkString(",")}")
  }

  /** Writer gate — every commit verb passes through here. */
  private def assertWritable(dir: String): Protocol = {
    val p = protocolAt(dir)
    assertReadable(dir, p)
    val unknownW = p.writerFeatures -- EngineProtocol.writerFeatures
    if (p.minWriter > EngineProtocol.minWriter || unknownW.nonEmpty)
      throw new UnsupportedProtocolException(
        s"table at $dir requires writer version ${p.minWriter} with " +
          s"features ${p.writerFeatures.mkString(",")}; this engine " +
          s"writes ${EngineProtocol.minWriter} with " +
          s"${EngineProtocol.writerFeatures.mkString(",")}")
    p
  }

  /** Protocol in force as of `upTo`: the LAST protocol record ≤ upTo
    * wins (records are monotone upgrades by construction), seeded
    * from the newest checkpoint sidecar like [[dvRefsAt]] so the
    * happy path replays only the log suffix.
    */
  def protocolAt(dir: String, upTo: Int = Int.MaxValue): Protocol = {
    val seedV = ckptVersions(dir)
      .filter(v => v <= upTo && Files.exists(ckptDvFile(dir, v)))
      .lastOption
    val seed = seedV match {
      case None => Protocol(1, 1)
      case Some(cv) =>
        val s = new String(Files.readAllBytes(ckptDvFile(dir, cv)),
          "UTF-8")
        sidecarProtocol(s)
    }
    readEntries(dir, after = seedV.getOrElse(0), upTo = upTo)
      .foldLeft(seed)((p, e) => e.protocol.getOrElse(p))
  }

  private def sidecarProtocol(s: String): Protocol =
    Protocol(
      jsonInt(s, "minReader").getOrElse(1),
      jsonInt(s, "minWriter").getOrElse(1),
      jsonArr(s, "readerFeatures").toSet,
      jsonArr(s, "writerFeatures").toSet)

  private def jsonInt(s: String, key: String): Option[Int] = {
    val i = s.indexOf("\"" + key + "\":")
    if (i < 0) None
    else Some(s.substring(i + key.length + 3).takeWhile(_.isDigit).toInt)
  }

  private def jsonLong(s: String, key: String): Option[Long] = {
    val i = s.indexOf("\"" + key + "\":")
    if (i < 0) None
    else Some(s.substring(i + key.length + 3).takeWhile(_.isDigit).toLong)
  }

  /** Escape-aware single string field (None if absent). */
  private def jsonStr(s: String, key: String): Option[String] = {
    val i = s.indexOf("\"" + key + "\":\"")
    if (i < 0) return None
    var j = i + key.length + 4
    val sb = new StringBuilder
    var inStr = true
    while (inStr) {
      val c = s.charAt(j)
      if (c == '\\') { sb.append(s.charAt(j + 1)); j += 2 }
      else if (c == '"') inStr = false
      else { sb.append(c); j += 1 }
    }
    Some(sb.toString)
  }

  // ---------------------------------------------------------------
  // Column mapping (RENAME / DROP without rewrite)
  // ---------------------------------------------------------------

  /** The logical↔physical column map (Delta's column mapping): the
    * PHYSICAL name a column was first written under never changes —
    * RENAME only re-points the logical name (a metadata commit, zero
    * bytes moved) and DROP hides the physical column (data removed
    * lazily, whenever a rewrite next touches a file). Replayed from
    * `renameFrom`/`renameTo`/`dropCols` entry fields in commit order,
    * so time travel resolves the names in force AT that version.
    */
  final case class ColumnMapping(renames: Map[String, String],
      dropped: Set[String],
      added: Seq[(String, String)] = Nil) {
    def active: Boolean =
      renames.nonEmpty || dropped.nonEmpty || added.nonEmpty
    /** Current logical name of a physical column; None = dropped. */
    def logicalOf(p: String): Option[String] =
      if (dropped.contains(p)) None else Some(renames.getOrElse(p, p))
    /** Physical name behind a logical column. */
    def physicalOf(l: String): String =
      renames.collectFirst { case (p, ll) if ll == l => p }.getOrElse(l)
    private[operators] def applyOps(renFrom: Seq[String],
        renTo: Seq[String], drops: Seq[String],
        addNames: Seq[String] = Nil,
        addTypes: Seq[String] = Nil): ColumnMapping = {
      var m = this
      renFrom.zip(renTo).foreach { case (o, n) =>
        val p = m.physicalOf(o)
        m = m.copy(renames = m.renames + (p -> n))
      }
      drops.foreach { l =>
        val p = m.physicalOf(l)
        m = m.copy(dropped = m.dropped + p)
      }
      // ADD COLUMN (metadata-only): the column's PHYSICAL name is its
      // name at add time — future appends stage it under that name;
      // until a file carries it, reads synthesize typed NULLs
      addNames.zip(addTypes).foreach { case (n, t) =>
        m = m.copy(added = m.added.filterNot(_._1 == n) :+ (n, t))
      }
      m
    }
  }

  val NoMapping: ColumnMapping = ColumnMapping(Map.empty, Set.empty)

  /** Per-application transaction watermarks (Delta's SetTransaction):
    * commit entries may carry `(txnApp, txnVer)`; a streaming sink
    * skips any batch whose version is ≤ the app's recorded watermark,
    * which makes replays idempotent EVEN WITH interleaved external
    * writers (the version-number scheme of [[commitAppendAt]] cannot
    * survive those). Checkpoint-sidecar-seeded like [[dvRefsAt]].
    */
  def txnsAt(dir: String,
      upTo: Int = Int.MaxValue): Map[String, Long] = {
    val seedV = ckptVersions(dir)
      .filter(v => v <= upTo && Files.exists(ckptDvFile(dir, v)))
      .lastOption
    val seed: Map[String, Long] = seedV match {
      case None => Map.empty
      case Some(cv) =>
        val s = new String(Files.readAllBytes(ckptDvFile(dir, cv)),
          "UTF-8")
        jsonArr(s, "txnApps")
          .zip(jsonArr(s, "txnVers").map(_.toLong)).toMap
    }
    readEntries(dir, after = seedV.getOrElse(0), upTo = upTo)
      .foldLeft(seed) { (m, e) =>
        e.txn match {
          case Some((app, ver)) =>
            m + (app -> math.max(ver, m.getOrElse(app, Long.MinValue)))
          case None => m
        }
      }
  }

  /** The newest batch version committed under `appId`, if any. */
  def lastTxn(dir: String, appId: String): Option[Long] =
    txnsAt(dir).get(appId)

  /** Mapping state as of `upTo`, checkpoint-sidecar-seeded like
    * [[dvRefsAt]].
    */
  def mappingAt(dir: String, upTo: Int = Int.MaxValue): ColumnMapping = {
    val seedV = ckptVersions(dir)
      .filter(v => v <= upTo && Files.exists(ckptDvFile(dir, v)))
      .lastOption
    val seed = seedV match {
      case None => NoMapping
      case Some(cv) =>
        val s = new String(Files.readAllBytes(ckptDvFile(dir, cv)),
          "UTF-8")
        ColumnMapping(
          jsonArr(s, "cmFrom").zip(jsonArr(s, "cmTo")).toMap,
          jsonArr(s, "cmDrop").toSet,
          jsonArr(s, "cmAddName").zip(jsonArr(s, "cmAddType")))
    }
    readEntries(dir, after = seedV.getOrElse(0), upTo = upTo)
      .foldLeft(seed)((m, e) =>
        m.applyOps(e.renameFrom, e.renameTo, e.dropCols,
          e.addColNames, e.addColTypes))
  }

  /** Project a PHYSICAL scan (optionally carrying `_f`/`_pos` meta)
    * to the logical view: dropped columns vanish, renamed columns
    * take their logical name, meta passes through.
    */
  private def toLogical(df: DataFrame, m: ColumnMapping): DataFrame =
    if (!m.active) df
    else {
      val base = df.select(df.columns.flatMap {
        case c @ ("_f" | "_pos") => Some(col(c))
        case p => m.logicalOf(p).map(l => col(p).as(l))
      }.toIndexedSeq: _*)
      // metadata-only ADD COLUMN: until some file carries the column,
      // synthesize typed NULLs; once materialized (mergeSchema
      // surfaces it), the physical projection above serves it
      val have = df.columns.toSet
      m.added.filter { case (p, _) =>
        !have.contains(p) && !m.dropped.contains(p)
      }.foldLeft(base) { case (acc, (p, t)) =>
        acc.withColumn(m.logicalOf(p).getOrElse(p),
          lit(null).cast(t))
      }
    }

  /** Rename a LOGICAL view back to physical names for staging. */
  private def toPhysical(df: DataFrame, m: ColumnMapping): DataFrame =
    if (!m.active) df
    else df.select(df.columns.map(l =>
      col(l).as(m.physicalOf(l))).toIndexedSeq: _*)

  /** Guard a batch about to land: a NEW logical column whose name is
    * already a physical name in use (renamed-away or dropped) would
    * collide in the files — rejected loudly (Delta avoids this with
    * UUID physical names; we keep readable physicals and refuse the
    * one ambiguous case instead).
    */
  private def assertNoPhysicalCollision(df: DataFrame,
      m: ColumnMapping): Unit = {
    if (!m.active) return
    val taken = m.renames.keySet ++ m.dropped
    val bad = df.columns.filter(l =>
      m.physicalOf(l) == l && taken.contains(l))
    require(bad.isEmpty,
      s"column(s) ${bad.mkString(", ")} collide with physical names " +
        "already in use by a renamed or dropped column; pick another " +
        "name")
  }

  private def schemaOpConflicts: Seq[Entry] => Option[String] =
    es =>
      if (es.exists(e => e.renameFrom.nonEmpty || e.dropCols.nonEmpty ||
          e.addColNames.nonEmpty))
        Some("concurrent schema change")
      else None

  /** The protocol rider a schema-op commit carries when the table has
    * never used column mapping: older readers must hard-fail rather
    * than serve physical names.
    */
  private def mappingProtocolRider(dir: String): Option[Protocol] = {
    val p = assertWritable(dir)
    if (p.readerFeatures.contains("column-mapping")) None
    else Some(p.upgradedWith(2, 2, Set("column-mapping"),
      Set("column-mapping")))
  }

  /** ALTER TABLE ... RENAME COLUMN old TO new — one metadata commit,
    * no data rewritten; reads at older versions keep the old name.
    */
  def renameColumn(spark: SparkSession, dir: String, oldName: String,
      newName: String): Int = {
    val readV = currentVersion(dir) // see commitDelete: the anchor
    val rider = mappingProtocolRider(dir)
    val m = mappingAt(dir, readV)
    val logical = snapshot(spark, dir).columns.toSet
    require(logical.contains(oldName), s"no such column: $oldName")
    require(!logical.contains(newName),
      s"column $newName already exists")
    // the new logical name must not shadow a physical name in use —
    // the same collision rule appends obey
    val taken = (m.renames.keySet ++ m.dropped) - m.physicalOf(oldName)
    require(!taken.contains(newName),
      s"column name $newName collides with a physical name in use")
    commitWithRetry(dir, Seq.empty, Seq.empty, readV + 1,
      schemaOpConflicts, dataChange = false, protocol = rider,
      renameFrom = Seq(oldName), renameTo = Seq(newName))
  }

  /** ALTER TABLE ... DROP COLUMN — hides the column now; bytes are
    * reclaimed lazily when rewrites touch the files.
    */
  def dropColumn(spark: SparkSession, dir: String,
      name: String): Int = {
    val readV = currentVersion(dir) // see commitDelete: the anchor
    val rider = mappingProtocolRider(dir)
    val logical = snapshot(spark, dir).columns.toSet
    require(logical.contains(name), s"no such column: $name")
    require(logical.size > 1, "cannot drop the last column")
    commitWithRetry(dir, Seq.empty, Seq.empty, readV + 1,
      schemaOpConflicts, dataChange = false, protocol = rider,
      dropCols = Seq(name))
  }

  /** ALTER TABLE ... ADD COLUMN name type — one METADATA-ONLY commit,
    * zero bytes moved (Delta's add-column): reads synthesize typed
    * NULLs for the new column until an append materializes it
    * (mergeSchema then surfaces the real values, NULL on older
    * files). `ddlType` is a Spark DDL type string (`BIGINT`,
    * `STRING`, `ARRAY<DOUBLE>`, ...). New columns are nullable by
    * definition — there is no data to backfill a NOT NULL.
    */
  def addColumn(spark: SparkSession, dir: String, name: String,
      ddlType: String): Int = {
    val readV = currentVersion(dir) // see commitDelete: the anchor
    assertWritable(dir)
    // the type must parse NOW — a bad DDL string poisoning every
    // later read would be far worse than failing the ALTER
    org.apache.spark.sql.types.DataType.fromDDL(ddlType)
    val m = mappingAt(dir, readV)
    val logical = snapshot(spark, dir).columns.toSet
    require(!logical.contains(name), s"column $name already exists")
    // same collision rule as appends: the new name must not shadow a
    // physical name a rename/drop left in use
    val taken = m.renames.keySet ++ m.dropped
    require(!taken.contains(name),
      s"column name $name collides with a physical name in use")
    commitWithRetry(dir, Seq.empty, Seq.empty, readV + 1,
      schemaOpConflicts, dataChange = false,
      addColNames = Seq(name), addColTypes = Seq(ddlType))
  }

  /** ALTER TABLE ... SET PROTOCOL: commit a metadata-only entry that
    * raises the table's requirements — monotone (no downgrade), and
    * concurrent protocol changes conflict rather than silently
    * last-write-win.
    */
  def upgradeProtocol(dir: String, minReader: Int, minWriter: Int,
      readerFeatures: Set[String] = Set.empty,
      writerFeatures: Set[String] = Set.empty): Int = {
    val readV = currentVersion(dir) // see commitDelete: the anchor
    val cur = assertWritable(dir)
    val next = cur.upgradedWith(minReader, minWriter, readerFeatures,
      writerFeatures)
    commitWithRetry(dir, Seq.empty, Seq.empty,
      readV + 1,
      es => if (es.exists(_.protocol.nonEmpty))
        Some("concurrent protocol change") else None,
      dataChange = false, protocol = Some(next))
  }

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  /** List a directory, CLOSING the stream (Files.list leaks an fd per
    * call otherwise — and log resolution runs on every snapshot).
    */
  private def listDir(p: Path): Seq[Path] =
    if (!Files.isDirectory(p)) Seq.empty
    else Using.resource(Files.list(p))(_.iterator().asScala.toList)

  private def entryFile(dir: String, v: Int): Path =
    logDir(dir).resolve(f"v$v%05d.json")

  private def protocolJson(p: Protocol): String =
    s""""minReader":${p.minReader},"minWriter":${p.minWriter},""" +
      s""""readerFeatures":[${p.readerFeatures.toSeq.sorted
        .map(f => "\"" + esc(f) + "\"").mkString(",")}],""" +
      s""""writerFeatures":[${p.writerFeatures.toSeq.sorted
        .map(f => "\"" + esc(f) + "\"").mkString(",")}]"""

  private[operators] def writeEntry(dir: String, e: Entry): Unit = {
    Files.createDirectories(logDir(dir))
    // in-commit timestamp: explicit ts wins (replays/tests), else the
    // clock — always bumped past the previous commit's ts so the
    // version order IS the timestamp order (TIMESTAMP AS OF needs a
    // total order even when racing writers have skewed clocks)
    val prevTs =
      if (e.version <= 1) 0L
      else try jsonLong(new String(
          Files.readAllBytes(entryFile(dir, e.version - 1)), "UTF-8"),
          "ts").getOrElse(0L)
        catch { case _: Exception => 0L }
    val ts = math.max(if (e.ts > 0) e.ts else clock(), prevTs + 1)
    val json = s"""{"version":${e.version},"ts":$ts,""" +
      s""""adds":[${e.adds.map(a => "\"" + esc(a) + "\"").mkString(",")}],""" +
      s""""removes":[${e.removes.map(r => "\"" + esc(r) + "\"").mkString(",")}],""" +
      s""""dvs":[${e.dvs.map(d => "\"" + esc(d) + "\"").mkString(",")}],""" +
      s""""dvReset":${e.dvReset},""" +
      e.protocol.map(p => protocolJson(p) + ",").getOrElse("") +
      (if (e.renameFrom.isEmpty) "" else
        s""""renameFrom":[${e.renameFrom.map(x => "\"" + esc(x) + "\"")
          .mkString(",")}],""" +
        s""""renameTo":[${e.renameTo.map(x => "\"" + esc(x) + "\"")
          .mkString(",")}],""") +
      (if (e.dropCols.isEmpty) "" else
        s""""dropCols":[${e.dropCols.map(x => "\"" + esc(x) + "\"")
          .mkString(",")}],""") +
      (if (e.addColNames.isEmpty) "" else
        s""""addColNames":[${e.addColNames.map(x => "\"" + esc(x) + "\"")
          .mkString(",")}],""" +
        s""""addColTypes":[${e.addColTypes.map(x => "\"" + esc(x) + "\"")
          .mkString(",")}],""") +
      e.txn.map { case (app, ver) =>
        s""""txnApp":"${esc(app)}","txnVer":$ver,""" }.getOrElse("") +
      s""""dataChange":${e.dataChange}}"""
    // The commit point must be ATOMIC AND COMPLETE: a bare
    // CREATE_NEW write exposes a window where a concurrent reader
    // sees the version file existing with partial JSON — the
    // cross-process stress caught exactly that (a truncated adds
    // array read as garbage paths, or a missing add making a racing
    // DELETE silently skip rows). So the entry is written fully to a
    // unique temp file and HARD-LINKED into place: POSIX link() is
    // atomic and fails with FileAlreadyExistsException when the
    // target exists, which keeps the exclusive same-version
    // commit-point semantics while guaranteeing readers only ever
    // see fully-formed entries.
    val tmp = logDir(dir).resolve(
      f".v${e.version}%05d.tmp-" + java.util.UUID.randomUUID.toString)
    Files.write(tmp, json.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
    try Files.createLink(entryFile(dir, e.version), tmp)
    catch {
      case _: UnsupportedOperationException =>
        // no hard links on this filesystem: fall back to the direct
        // CREATE_NEW write (single-writer deployments keep working;
        // multi-writer needs a link-capable store)
        Files.write(entryFile(dir, e.version),
          json.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        ()
    } finally { Files.deleteIfExists(tmp); () }
    ()
  }

  /** Version numbers present in the log, from the file names alone —
    * no JSON is read, so `currentVersion` is one directory listing.
    */
  private def logVersions(dir: String): Seq[Int] =
    listDir(logDir(dir))
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toInt)
      .sorted

  /** Escape-aware JSON string-array parse: generated stage names are
    * benign, but a shallow CLONE logs arbitrary absolute SOURCE paths
    * — a legal path containing ',' ']' or '"' must round-trip (esc()
    * writes \" and \\; this undoes them, and never splits inside a
    * quoted string). Missing key ⇒ empty (field absent in old entries).
    */
  private def jsonArr(s: String, key: String): Seq[String] = {
    val i = s.indexOf("\"" + key + "\":[")
    if (i < 0) return Seq.empty
    var j = i + key.length + 4
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = false
    while (!done) {
      s.charAt(j) match {
        case ']' => done = true
        case '"' =>
          j += 1
          val sb = new StringBuilder
          var inStr = true
          while (inStr) {
            val c = s.charAt(j)
            if (c == '\\') { sb.append(s.charAt(j + 1)); j += 2 }
            else if (c == '"') { inStr = false; j += 1 }
            else { sb.append(c); j += 1 }
          }
          out += sb.toString
        case _ => j += 1 // comma, whitespace
      }
    }
    out.toSeq
  }

  /** Parse log entries with version in (`after`, `upTo`] — the
    * checkpoint-suffix read path; `after = 0, upTo = MaxValue` is the
    * full replay.
    */
  private def readEntries(dir: String, after: Int = 0,
      upTo: Int = Int.MaxValue): Seq[Entry] =
    logVersions(dir).filter(v => v > after && v <= upTo).map { v =>
      val s = new String(Files.readAllBytes(entryFile(dir, v)), "UTF-8")
      // entries written before the flag existed default to
      // dataChange=true (the conservative reading: include in the feed)
      val e = Entry(v, jsonArr(s, "adds"), jsonArr(s, "removes"),
        dataChange = !s.contains("\"dataChange\":false"),
        dvs = jsonArr(s, "dvs"),
        dvReset = s.contains("\"dvReset\":true"),
        protocol = jsonInt(s, "minReader").map(_ => sidecarProtocol(s)),
        renameFrom = jsonArr(s, "renameFrom"),
        renameTo = jsonArr(s, "renameTo"),
        dropCols = jsonArr(s, "dropCols"),
        addColNames = jsonArr(s, "addColNames"),
        addColTypes = jsonArr(s, "addColTypes"),
        txn = jsonStr(s, "txnApp").map(app =>
          (app, jsonLong(s, "txnVer").getOrElse(0L))),
        ts = jsonLong(s, "ts").getOrElse(0L))
      // the READ gate: parsing an entry that demands a newer reader
      // hard-fails right here — every read and write path funnels
      // through this parser, so no caller can misread a protected
      // table (Delta's protocol contract)
      e.protocol.foreach(assertReadable(dir, _))
      e
    }

  /** Current highest committed version (0 = empty table). */
  def currentVersion(dir: String): Int =
    logVersions(dir).lastOption.getOrElse(0)

  /** In-commit timestamp (millis) of a committed version; 0 for
    * pre-timestamp-era entries.
    */
  def commitTimestamp(dir: String, v: Int): Long =
    try jsonLong(new String(Files.readAllBytes(entryFile(dir, v)),
        "UTF-8"), "ts").getOrElse(0L)
    catch { case _: Exception => 0L }

  /** TIMESTAMP AS OF resolution (Delta's rule): the greatest version
    * whose in-commit timestamp is <= `tsMillis`; a timestamp before
    * the first commit errors loudly, one past the last resolves to
    * the head. Timestamps are monotone in version by construction
    * ([[writeEntry]]), so this is a binary search reading
    * O(log commits) entry files — no full log replay.
    */
  def versionAt(dir: String, tsMillis: Long): Int = {
    val vs = logVersions(dir)
    require(vs.nonEmpty, s"no commits in $dir")
    require(commitTimestamp(dir, vs.head) <= tsMillis,
      s"timestamp $tsMillis is before the table's first commit " +
        s"(${commitTimestamp(dir, vs.head)})")
    var lo = 0
    var hi = vs.size - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) / 2
      if (commitTimestamp(dir, vs(mid)) <= tsMillis) lo = mid
      else hi = mid - 1
    }
    vs(lo)
  }

  private def replay(live: scala.collection.mutable.LinkedHashSet[String],
      entries: Seq[Entry]): Unit =
    entries.foreach { e => live ++= e.adds; live --= e.removes }

  /** Live data-file names as of `version` (None = latest) by FULL log
    * replay — the no-SparkSession path (and the oracle the checkpoint
    * path must equal).
    */
  def liveFiles(dir: String, version: Option[Int] = None): Seq[String] = {
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    replay(live, readEntries(dir, upTo = version.getOrElse(Int.MaxValue)))
    live.toSeq
  }

  // ---------------------------------------------------------------
  // Checkpoints
  // ---------------------------------------------------------------

  private def ckptDir(dir: String, v: Int): Path =
    logDir(dir).resolve(f"ckpt-v$v%05d")

  private def lastCkptFile(dir: String): Path =
    logDir(dir).resolve("_last_checkpoint")

  /** Checkpoint versions present on disk (from directory names). */
  private def ckptVersions(dir: String): Seq[Int] =
    listDir(logDir(dir))
      .map(_.getFileName.toString)
      .filter(_.startsWith("ckpt-v"))
      .map(_.stripPrefix("ckpt-v").toInt)
      .sorted

  /** Write a parquet checkpoint of the CURRENT resolved live-file set
    * and repoint `_last_checkpoint` at it. Returns the checkpointed
    * version. The parquet is tiny (one `file` column, O(live files))
    * but distributed-scannable — at 10⁶ files the planner can read it
    * without the driver holding the list as JSON.
    */
  def checkpoint(spark: SparkSession, dir: String): Int = {
    val v = currentVersion(dir)
    val live = liveFiles(dir, Some(v))
    val rows = live.map(Row(_)).asJava
    // the checkpoint must appear ATOMICALLY: latestCkptUpTo's
    // directory-listing fallback would otherwise see a concurrent
    // writer's half-written parquet dir — observed in the
    // cross-process stress as either UNABLE_TO_INFER_SCHEMA or,
    // worse, an INCOMPLETE live-file base that made a racing DELETE
    // silently skip rows. Build everything (parquet + sidecar) in a
    // hidden temp dir, then one atomic rename; a same-version loser
    // just discards its copy (the content is identical by
    // construction).
    val tmpD = logDir(dir).resolve(
      f".ckpt-v$v%05d.tmp-" + java.util.UUID.randomUUID.toString.take(8))
    spark.createDataFrame(rows,
        StructType(Seq(StructField("file", StringType))))
      .coalesce(1)
      .write.mode("overwrite").parquet(tmpD.toString)
    // the DV refs (and implicitly the last reset) in force at v ride
    // the checkpoint as an underscore-prefixed sidecar INSIDE the
    // checkpoint dir (parquet readers skip '_' files), so dvRefsAt
    // replays only the post-checkpoint suffix — mirroring how Delta
    // checkpoints carry DV descriptors; without it every snapshot of
    // a 10^5-commit table pays a full JSON replay just to learn the
    // table never used DVs
    // the sidecar carries the full non-file log state at v: DV refs
    // AND the protocol, so both resolve from ckpt + suffix
    val dvs = dvRefsAt(dir, v) // itself seeded from the prior sidecar
    val prot = protocolAt(dir, v)
    val cm = mappingAt(dir, v)
    val txns = txnsAt(dir, v).toSeq.sortBy(_._1)
    def arr(xs: Seq[String]) =
      xs.map(x => "\"" + esc(x) + "\"").mkString(",")
    val cmPairs = cm.renames.toSeq.sortBy(_._1)
    Files.write(tmpD.resolve(CkptSidecarName),
      (s"""{"dvs":[${arr(dvs)}],""" +
        s""""cmFrom":[${arr(cmPairs.map(_._1))}],""" +
        s""""cmTo":[${arr(cmPairs.map(_._2))}],""" +
        s""""cmDrop":[${arr(cm.dropped.toSeq.sorted)}],""" +
        s""""cmAddName":[${arr(cm.added.map(_._1))}],""" +
        s""""cmAddType":[${arr(cm.added.map(_._2))}],""" +
        s""""txnApps":[${arr(txns.map(_._1))}],""" +
        s""""txnVers":[${arr(txns.map(_._2.toString))}],""" +
        protocolJson(prot) + "}")
        .getBytes("UTF-8"))
    try Files.move(tmpD, ckptDir(dir, v),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      // a racing checkpoint of the SAME version won: identical
      // content by construction — drop ours. Only exceptions that
      // PROVE the race (target exists) are benign; swallowing every
      // FileSystemException here once silently and permanently
      // disabled checkpointing on filesystems without atomic dir
      // rename while still advancing _last_checkpoint
      case _: java.nio.file.FileAlreadyExistsException =>
        deleteDirRec(tmpD)
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        // no atomic rename on this fs: fall back to a plain move
        // (rename where possible, copy+delete cross-device). A reader
        // listing mid-move can see a torn dir, but latestCkptUpTo
        // falls back past an unreadable checkpoint — strictly better
        // than never checkpointing
        try Files.move(tmpD, ckptDir(dir, v))
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            deleteDirRec(tmpD)
          case e: java.nio.file.DirectoryNotEmptyException =>
            // ambiguous: a lost race (target exists) throws this, but
            // so does a cross-device move of a non-empty dir (source
            // needs copying). Only the PROVEN race is benign —
            // swallowing the other case would silently skip every
            // checkpoint on such filesystems
            deleteDirRec(tmpD)
            if (!Files.isDirectory(ckptDir(dir, v))) throw e
        }
      case e: java.nio.file.FileSystemException =>
        deleteDirRec(tmpD)
        // some filesystems report the lost race as a generic
        // FileSystemException — the target existing is the proof
        if (!Files.isDirectory(ckptDir(dir, v))) throw e
    }
    // _last_checkpoint is advisory (the one overwritten file, exactly
    // Delta's shape); a stale or missing pointer falls back to the
    // checkpoint-directory listing
    Files.write(lastCkptFile(dir),
      s"""{"version":$v}""".getBytes("UTF-8"))
    v
  }

  /** Newest checkpoint version ≤ `upTo`, fast-pathed through
    * `_last_checkpoint`, falling back to the listing when the pointer
    * is missing, unparseable, or beyond the requested version.
    */
  private def latestCkptUpTo(dir: String, upTo: Int): Option[Int] = {
    val hinted =
      try {
        val s = new String(Files.readAllBytes(lastCkptFile(dir)), "UTF-8")
        val v = s.substring(s.indexOf("\"version\":") + 10)
          .takeWhile(_.isDigit).toInt
        if (v <= upTo && Files.isDirectory(ckptDir(dir, v))) Some(v)
        else None
      } catch { case _: Exception => None }
    hinted.orElse(ckptVersions(dir).filter(_ <= upTo).lastOption)
  }

  /** Checkpoint-accelerated live-file resolution: load the newest
    * checkpoint ≤ target and replay only the log suffix after it —
    * O(suffix) JSON reads instead of O(all commits). Must equal
    * [[liveFiles]] exactly (pinned in TxTableSpec).
    */
  def liveFilesFast(spark: SparkSession, dir: String,
      version: Option[Int] = None): Seq[String] = {
    val upTo = version.getOrElse(currentVersion(dir))
    latestCkptUpTo(dir, upTo) match {
      case None => liveFiles(dir, Some(upTo))
      case Some(cv) =>
        val base = spark.read.parquet(ckptDir(dir, cv).toString)
          .collect().map(_.getString(0)).toSeq
        val live = scala.collection.mutable.LinkedHashSet.empty[String]
        live ++= base
        replay(live, readEntries(dir, after = cv, upTo = upTo))
        live.toSeq
    }
  }

  // ---------------------------------------------------------------
  // Commit machinery
  // ---------------------------------------------------------------

  /** Unique staging directory for one commit ATTEMPT. The version
    * prefix is advisory (a retried commit keeps its original stage
    * name); the random token is what guarantees two racing writers
    * never share a directory, so the loser's files can never clobber
    * the winner's.
    */
  private def newStageDir(dir: String, v: Int): Path =
    dataDir(dir).resolve(
      f"v$v%05d-" + java.util.UUID.randomUUID.toString.take(8))

  /** Stage `df` into a fresh unique directory; returns the relative
    * file names to record as the commit's adds.
    */
  private def stage(df: DataFrame, dir: String, v: Int): Seq[String] = {
    val sd = newStageDir(dir, v)
    df.write.mode("overwrite").parquet(sd.toString)
    val rel = sd.getFileName.toString
    listDir(sd).map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).sorted
      .map(n => s"$rel/$n")
  }

  /** Stage `df` hive-partitioned on `partitionBy`: the writer splits
    * on duplicate `__p_<col>` columns (dropped from the files by
    * `partitionBy` itself) so the data files KEEP the real columns
    * while landing under `__p_col=value/` directories whose names
    * [[partitionValuesOf]] reads back. One shuffle on the partition
    * keys first, so each partition's rows land in few files instead
    * of one-per-task fragmentation.
    */
  private def stagePartitioned(df: DataFrame, dir: String, v: Int,
      partitionBy: Seq[String]): Seq[String] = {
    if (partitionBy.isEmpty) return stage(df, dir, v)
    require(!df.columns.exists(_.startsWith(PartPrefix)),
      s"column names may not start with the reserved '$PartPrefix' " +
        "partition prefix")
    val sd = newStageDir(dir, v)
    val dup = partitionBy.foldLeft(df)((d, c) =>
      d.withColumn(s"$PartPrefix$c", col(c)))
    dup.repartition(partitionBy.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionBy.map(PartPrefix + _): _*)
      .parquet(sd.toString)
    val rel = sd.getFileName.toString
    def walk(p: Path, pre: String): Seq[String] = listDir(p).flatMap { c =>
      val n = c.getFileName.toString
      if (Files.isDirectory(c)) walk(c, s"$pre$n/")
      else if (n.endsWith(".parquet")) Seq(s"$pre$n")
      else Seq.empty
    }
    walk(sd, s"$rel/").sorted
  }

  /** Partition columns (physical names) carried by any of `files` —
    * the layout a rewrite must re-land its survivors under, or
    * pruning would silently degrade on every DELETE/UPDATE/MERGE.
    */
  private def pvalColsOf(files: Seq[String]): Seq[String] =
    files.flatMap(f => partitionValuesOf(f).keys).distinct

  /** Split live files for a predicate mutation: `whole` = files whose
    * path partition values PROVE a total match (the metadata-only
    * drop), `affected` = files among the rest holding at least one
    * matching visible row (one distributed scan; the distinct and the
    * suffix mapping stay distributed, the driver receives only the
    * names the log entry must carry). Shared by DELETE and
    * replaceWhere so the fast-path/scan split can never diverge
    * between the two verbs.
    */
  private def resolveAffected(spark: SparkSession, dir: String,
      files: Seq[String], pred: org.apache.spark.sql.Column,
      matches: org.apache.spark.sql.Column, dvs: Seq[String],
      m: ColumnMapping,
      version: Option[Int] = None): (Seq[String], Seq[String]) = {
    val whole = whollyMatchingFiles(spark, dir, files, pred, m, version)
    val rest = files.filterNot(whole.toSet)
    val affected =
      if (rest.isEmpty) Seq.empty[String]
      else {
        val affectedRel = visibleWithMeta(spark, dir, rest, dvs, m)
          .filter(matches)
          .select(col("_f"))
          .distinct().collect().map(_.getString(0)).toSet
        rest.filter(f => affectedRel.contains(relSuffix(f)))
      }
    (whole, affected)
  }

  /** [[stagePartitioned]] + CHECK-constraint validation of the staged
    * bytes, the partitioned twin of [[stageValidated]].
    */
  private def stageValidatedPartitioned(df: DataFrame, dir: String,
      v: Int, partitionBy: Seq[String],
      m: ColumnMapping): Seq[String] = {
    val added = stagePartitioned(df, dir, v, partitionBy)
    try { enforceConstraintsStaged(df.sparkSession, dir, added, m); added }
    catch {
      case e: ConstraintViolationException =>
        if (added.nonEmpty)
          deleteDirRec(dataDir(dir).resolve(stageRelOf(added)))
        throw e
    }
  }

  /** The optimistic commit loop: try `CREATE_NEW` at `firstV`; on
    * loss, re-read ONLY the interleaved entries, ask `conflicts`
    * whether they invalidate what this commit read, and retry at the
    * next version (no data is restaged — staging dirs are unique).
    * Exactly Delta's protocol shape: the log write is cheap, the
    * staged data is the expensive part, and only a REAL conflict
    * aborts.
    */
  private[operators] def commitWithRetry(dir: String, adds: Seq[String],
      removes: Seq[String], firstV: Int,
      conflicts: Seq[Entry] => Option[String],
      maxAttempts: Int = 20, dataChange: Boolean = true,
      dvs: Seq[String] = Nil, dvReset: Boolean = false,
      protocol: Option[Protocol] = None,
      renameFrom: Seq[String] = Nil, renameTo: Seq[String] = Nil,
      dropCols: Seq[String] = Nil,
      addColNames: Seq[String] = Nil, addColTypes: Seq[String] = Nil,
      txn: Option[(String, Long)] = None): Int = {
    var v = firstV
    var validatedThrough = firstV - 1
    var attempt = 0
    while (true) {
      try {
        writeEntry(dir, Entry(v, adds, removes, dataChange, dvs, dvReset,
          protocol, renameFrom, renameTo, dropCols, addColNames,
          addColTypes, txn))
        return v
      }
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        attempt += 1
        if (attempt >= maxAttempts)
          throw new CommitConflictException(
            s"gave up after $maxAttempts attempts at $dir")
        val latest = currentVersion(dir)
        val interleaved = readEntries(dir, after = validatedThrough,
          upTo = latest)
        conflicts(interleaved).foreach { why =>
          throw new CommitConflictException(
            s"concurrent commit conflicts at $dir v$v: $why")
        }
        validatedThrough = latest
        v = latest + 1
      }
    }
    v // unreachable
  }

  /** Appends never conflict — any interleave serializes cleanly. */
  private[operators] val AppendConflicts: Seq[Entry] => Option[String] = _ => None

  /** A remove-carrying commit (delete/merge) read the whole live set:
    * interleaved ADDS may hold rows it should have seen (its
    * predicate/keys can't be re-checked without re-running), and
    * interleaved REMOVES of its inputs mean it would resurrect or
    * double-delete rows — both abort, matching Delta's serializable
    * conflict matrix.
    */
  private[operators] def rewriteConflicts(ourRemoves: Set[String])
      : Seq[Entry] => Option[String] = es => {
    val added = es.flatMap(_.adds)
    val removed = es.flatMap(_.removes).toSet
    if (added.nonEmpty)
      Some(s"${added.size} file(s) added concurrently (unscanned rows)")
    else if (es.exists(e => e.dvs.nonEmpty || e.dvReset))
      // an interleaved DV commit (or restore/purge) changed row
      // visibility AFTER we read: our staged survivors would
      // resurrect its deleted rows (or re-delete restored ones)
      Some("deletion-vector state changed concurrently")
    else {
      val hit = removed.intersect(ourRemoves)
      if (hit.nonEmpty) Some(s"input file(s) removed concurrently: " +
        hit.take(3).mkString(", "))
      else None
    }
  }

  /** Compaction only re-arranges rows: interleaved adds stay live
    * untouched (fine), but an interleaved remove of a compaction
    * input would be resurrected by the compacted output — abort.
    */
  private[operators] def compactConflicts(inputs: Set[String])
      : Seq[Entry] => Option[String] = es => {
    val hit = es.flatMap(_.removes).toSet.intersect(inputs)
    if (hit.nonEmpty) Some(s"compaction input(s) removed concurrently: " +
      hit.take(3).mkString(", "))
    else if (es.exists(e => e.dvs.nonEmpty || e.dvReset))
      // the compacted output materialized the OLD DV state; an
      // interleaved DV delete on an input would be silently undone
      Some("deletion-vector state changed concurrently")
    else None
  }

  /** A bare DV-state RESET (purge with no live DV'd files): clearing
    * a DV an interleaved commit added — one this reset never saw —
    * would silently resurrect its deleted rows, so any interleaved
    * DV activity aborts; plain appends interleave freely (new files
    * carry no DVs to clear).
    */
  private[operators] val dvResetConflicts: Seq[Entry] => Option[String] =
    es =>
      if (es.exists(e => e.dvs.nonEmpty || e.dvReset))
        Some("deletion-vector state changed concurrently")
      else None

  /** A merge-on-read delete's own matrix: interleaved adds carry
    * unscanned rows (abort) and removes/restores of its input files
    * invalidate its positions (abort) — but an interleaved PURE DV
    * commit is safe: two position sets union commutatively (deleting
    * an already-deleted row is a no-op), so concurrent DV deletes all
    * land, Delta's DV-vs-DV concurrency win.
    */
  private[operators] def dvDeleteConflicts(ourInputs: Set[String])
      : Seq[Entry] => Option[String] = es => {
    val added = es.flatMap(_.adds)
    if (added.nonEmpty)
      Some(s"${added.size} file(s) added concurrently (unscanned rows)")
    else if (es.exists(_.dvReset))
      Some("restore/purge interleaved with a DV delete")
    else {
      val hit = es.flatMap(_.removes).toSet.intersect(ourInputs)
      if (hit.nonEmpty) Some(s"input file(s) removed concurrently: " +
        hit.take(3).mkString(", "))
      else None
    }
  }

  private def maybeCheckpoint(spark: SparkSession, dir: String, v: Int,
      every: Int): Unit =
    if (every > 0 && v % every == 0) { checkpoint(spark, dir); () }

  /** Append `df` as a new commit: data files land first (invisible,
    * in a unique staging dir), the log entry makes them live; a lost
    * race retries at the next version without restaging.
    */
  def commitAppend(df: DataFrame, dir: String,
      checkpointEvery: Int = DefaultCheckpointEvery,
      statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil,
      txn: Option[(String, Long)] = None,
      partitionBy: Seq[String] = Nil): Int = {
    assertWritable(dir)
    val m = mappingAt(dir)
    assertNoPhysicalCollision(df, m)
    val v0 = currentVersion(dir) + 1
    val added = stageValidatedPartitioned(toPhysical(df, m), dir, v0,
      partitionBy.map(m.physicalOf), m)
    writeStats(df.sparkSession, dir, stageRelOf(added), added,
      statsCols.map(m.physicalOf), bloomCols.map(m.physicalOf))
    val v = commitWithRetry(dir, added, Seq.empty, v0, AppendConflicts,
      txn = txn)
    maybeCheckpoint(df.sparkSession, dir, v, checkpointEvery)
    v
  }

  /** The unique stage-dir name shared by one commit's adds. */
  private def stageRelOf(added: Seq[String]): String =
    added.headOption.map(_.takeWhile(_ != '/')).getOrElse("")

  /** Predicate delete: rewrite ONLY the files containing a matching
    * row; untouched files stay live under their old names. Surviving
    * rows of affected files re-land as this commit's adds. DELETE
    * semantics keep every row where `pred` is NOT TRUE — `coalesce`
    * on both sides so NULL-predicate rows neither select a file
    * spuriously nor vanish from the rewrite.
    */
  def commitDelete(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column,
      checkpointEvery: Int = DefaultCheckpointEvery,
      statsCols: Seq[String] = Nil): Int = {
    assertWritable(dir)
    // the READ VERSION anchors the whole operation: files/DVs/mapping
    // resolve AS OF readV and the commit conflict-checks EVERYTHING
    // after it — computing v0 from currentVersion after the
    // distributed scans left a window where an interleaved rewrite of
    // the same file was never validated (two racing deletes could
    // both rewrite one file and resurrect each other's deleted rows;
    // caught by the cross-process stress)
    val readV = currentVersion(dir)
    val files = liveFilesFast(spark, dir, Some(readV))
    val matches = coalesce(pred, lit(false))
    val dvs = dvRefsAt(dir, readV)
    val m = mappingAt(dir, readV)
    // which files hold a matching row? one distributed scan; the
    // distinct aggregation and full-path -> suffix mapping run
    // DISTRIBUTED, so the driver receives only the bounded set of
    // affected names it must write into the log entry anyway (never
    // row data, and never an O(files^2) suffix scan — at 10^6 live
    // files that scan was the wide-delete bottleneck). DV-deleted
    // rows are invisible: a file whose only matches are already
    // deleted is not rewritten, and its survivors re-land WITHOUT
    // them (a rewrite materializes the file's DV, Delta's rule).
    // metadata-only fast path (Delta's partition delete): a file whose
    // PATH partition values prove every row matches drops straight out
    // of the log — no scan, no rewrite, no DV; DELETE WHERE p = v on a
    // 100 TB partitioned table is one log write. Sound with DVs: the
    // already-hidden rows were not visible before either, and the
    // change feed diffs the removed files under the PRE-commit DV
    // state, so only still-visible rows are reported deleted.
    val (whole, affected) =
      resolveAffected(spark, dir, files, pred, matches, dvs, m,
        Some(readV))
    if (whole.isEmpty && affected.isEmpty) return currentVersion(dir)
    val v0 = readV + 1
    val added =
      if (affected.isEmpty) Seq.empty[String]
      else {
        val affVisible = visibleWithMeta(spark, dir, affected, dvs, m)
        // survivors re-land under their partition directories
        stagePartitioned(
          toPhysical(affVisible.filter(!matches).drop("_f", "_pos"), m),
          dir, v0, pvalColsOf(affected))
      }
    if (added.nonEmpty)
      writeStats(spark, dir, stageRelOf(added), added,
        statsCols.map(m.physicalOf))
    val removes = whole ++ affected
    val v = commitWithRetry(dir, added, removes, v0,
      rewriteConflicts(removes.toSet))
    maybeCheckpoint(spark, dir, v, checkpointEvery)
    v
  }

  /** Atomic INSERT OVERWRITE WHERE (Delta's replaceWhere): ONE commit
    * removes every current row matching `pred` and lands `df` in its
    * place — the idempotent batch-reload shape (recompute a partition
    * or date range, swap it in atomically; a reader sees the old or
    * the new rows, never both, never neither). Every incoming row must
    * itself satisfy `pred` (checked BEFORE any bytes land, Delta's
    * rule — otherwise a replay would not be idempotent). Files whose
    * PATH partition values prove a total match drop metadata-only;
    * partially-matching files rewrite survivors — exactly the
    * [[commitDelete]] contract, plus the new data in the same commit.
    */
  def commitReplaceWhere(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column, df: DataFrame,
      partitionBy: Seq[String] = Nil,
      checkpointEvery: Int = DefaultCheckpointEvery,
      statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): Int = {
    assertWritable(dir)
    // the anchor comes FIRST — before mapping resolution and before
    // the input-validation Spark job — matching commitDelete/Update/
    // Merge: every byte of state this verb reads is AS OF readV, so a
    // commit (incl. a schema op) landing during validation surfaces as
    // a conflict instead of being half-seen
    val readV = currentVersion(dir)
    val m = mappingAt(dir, readV)
    assertNoPhysicalCollision(df, m)
    val matches = coalesce(pred, lit(false))
    val bad = df.filter(!matches).limit(1).count()
    if (bad > 0) throw new IllegalArgumentException(
      "replaceWhere: input rows do not all satisfy the predicate")
    val files = liveFilesFast(spark, dir, Some(readV))
    val dvs = dvRefsAt(dir, readV)
    val (whole, affected) =
      resolveAffected(spark, dir, files, pred, matches, dvs, m,
        Some(readV))
    val v0 = readV + 1
    // the new data first (constraint-validated; a rejection leaves
    // nothing staged), then survivors of partially-matching files
    val newAdds = stageValidatedPartitioned(toPhysical(df, m), dir, v0,
      partitionBy.map(m.physicalOf), m)
    if (newAdds.nonEmpty)
      writeStats(spark, dir, stageRelOf(newAdds), newAdds,
        statsCols.map(m.physicalOf), bloomCols.map(m.physicalOf))
    val survivorAdds =
      if (affected.isEmpty) Seq.empty[String]
      else {
        val affVisible = visibleWithMeta(spark, dir, affected, dvs, m)
        val s = stagePartitioned(
          toPhysical(affVisible.filter(!matches).drop("_f", "_pos"), m),
          dir, v0, pvalColsOf(affected))
        if (s.nonEmpty)
          writeStats(spark, dir, stageRelOf(s), s,
            statsCols.map(m.physicalOf))
        s
      }
    val removes = whole ++ affected
    val v = commitWithRetry(dir, newAdds ++ survivorAdds, removes, v0,
      rewriteConflicts(removes.toSet))
    maybeCheckpoint(spark, dir, v, checkpointEvery)
    v
  }

  /** Predicate UPDATE (copy-on-write): rewrite ONLY the files holding
    * a matching row, applying `sets` to the matching rows; untouched
    * files stay live under their old names — the same affected-file
    * contract as [[commitDelete]], so update cost rides the matched
    * data, never table size. Assigned values are cast to the column's
    * declared type (SQL UPDATE stores the cast); a NULL predicate row
    * is NOT updated (three-valued logic: only TRUE matches). CHECK
    * constraints validate the staged rows — an update that would land
    * a violating row aborts whole.
    */
  def commitUpdate(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      checkpointEvery: Int = DefaultCheckpointEvery,
      statsCols: Seq[String] = Nil): Int = {
    assertWritable(dir)
    val readV = currentVersion(dir) // see commitDelete: the anchor
    val files = liveFilesFast(spark, dir, Some(readV))
    val matches = coalesce(pred, lit(false))
    val dvs = dvRefsAt(dir, readV)
    val m = mappingAt(dir, readV)
    val affectedRel = visibleWithMeta(spark, dir, files, dvs, m)
      .filter(matches)
      .select(col("_f"))
      .distinct().collect().map(_.getString(0)).toSet
    val affected = files.filter(f => affectedRel.contains(relSuffix(f)))
    if (affected.isEmpty) return currentVersion(dir)
    val v0 = readV + 1
    val affVisible = visibleWithMeta(spark, dir, affected, dvs, m)
    val setMap = sets.toMap
    val unknown = setMap.keySet -- affVisible.columns.toSet
    require(unknown.isEmpty, s"UPDATE SET of unknown column(s): " +
      unknown.mkString(", "))
    val updated = affVisible.select(
      affVisible.schema.fields
        .filterNot(f => f.name == "_f" || f.name == "_pos")
        .map { f =>
          setMap.get(f.name) match {
            case Some(v) =>
              when(matches, v.cast(f.dataType)).otherwise(col(f.name))
                .as(f.name)
            case None => col(f.name)
          }
        }.toIndexedSeq: _*)
    // survivors + updated rows re-land under their partition dirs
    val added = stageValidatedPartitioned(toPhysical(updated, m),
      dir, v0, pvalColsOf(affected), m)
    writeStats(spark, dir, stageRelOf(added), added,
      statsCols.map(m.physicalOf))
    val v = commitWithRetry(dir, added, affected, v0,
      rewriteConflicts(affected.toSet))
    maybeCheckpoint(spark, dir, v, checkpointEvery)
    v
  }

  /** One WHEN clause of a SQL MERGE: `kind` ∈ update | delete |
    * insert; `cond` the optional AND-condition; `sets` the
    * assignments (update/insert). Column expressions reference target
    * columns by their plain names and source columns under the
    * `__src_` prefix — [[commitMergeDml]] renames the source side
    * before joining, so the two sides can never collide.
    */
  final case class MergeClause(kind: String,
      cond: Option[org.apache.spark.sql.Column],
      sets: Seq[(String, org.apache.spark.sql.Column)])

  /** Full SQL MERGE semantics (SQL:2003 / Delta's contract) on the
    * copy-on-write path:
    *
    *  - WHEN MATCHED clauses fire in order, first TRUE condition
    *    wins; a target row matching MORE THAN ONE source row with
    *    any matched clause present is a cardinality violation and
    *    aborts (Delta's `MERGE_CARDINALITY_VIOLATION`);
    *  - WHEN NOT MATCHED (by target) inserts source rows, first
    *    applicable clause wins, unassigned target columns NULL;
    *  - WHEN NOT MATCHED BY SOURCE updates/deletes target rows with
    *    no match — present ⇒ every live file is affected (the clause
    *    reads the whole table by definition);
    *
    * Only files holding a row the merge TOUCHES are rewritten;
    * survivors of those files re-land beside the new rows in ONE
    * atomic commit under the serializable rewrite conflict matrix.
    * CHECK constraints validate the staged rows.
    */
  def commitMergeDml(spark: SparkSession, dir: String,
      source: DataFrame, cond: org.apache.spark.sql.Column,
      matched: Seq[MergeClause] = Nil,
      notMatched: Seq[MergeClause] = Nil,
      notMatchedBySource: Seq[MergeClause] = Nil,
      checkpointEvery: Int = DefaultCheckpointEvery,
      statsCols: Seq[String] = Nil): Int = {
    assertWritable(dir)
    require((matched ++ notMatched ++ notMatchedBySource).nonEmpty,
      "MERGE needs at least one WHEN clause")
    val readV = currentVersion(dir) // see commitDelete: the anchor
    val files = liveFilesFast(spark, dir, Some(readV))
    val dvs = dvRefsAt(dir, readV)
    val m = mappingAt(dir, readV)
    val visible = visibleWithMeta(spark, dir, files, dvs, m)
    // source side renamed up front: __src_<name> everywhere, plus the
    // match marker no real column can collide with
    val src = source.columns.foldLeft(source)((df, c) =>
      if (c.startsWith("__src_")) df
      else df.withColumnRenamed(c, s"__src_$c"))
      .withColumn("__src_exists", lit(true))
    val dataFields = visible.schema.fields
      .filterNot(f => f.name == "_f" || f.name == "_pos").toIndexedSeq
    val dataCols = dataFields.map(_.name)
    // which files does the merge touch? NOT-MATCHED-BY-SOURCE reads
    // every row by definition; an INSERT-ONLY merge (no matched, no
    // not-matched-by-source clause) touches NONE — it is a pure
    // append, and rewriting every matched file byte-identically would
    // waste a full scan and abort concurrent rewrites for nothing;
    // otherwise one distributed semi join
    val affected =
      if (notMatchedBySource.nonEmpty) files
      else if (matched.isEmpty) Seq.empty[String]
      else {
        val affectedRel = visible
          .join(src, cond, "left_semi")
          .select(col("_f"))
          .distinct().collect().map(_.getString(0)).toSet
        files.filter(f => affectedRel.contains(relSuffix(f)))
      }
    val aff =
      if (affected.isEmpty) visible.limit(0)
      else visibleWithMeta(spark, dir, affected, dvs, m)
    // first-applicable-clause index (-1 = none): when() chains give
    // natural first-TRUE-wins evaluation
    def actIdx(clauses: Seq[MergeClause]): org.apache.spark.sql.Column =
      clauses.zipWithIndex.foldRight(lit(-1): org.apache.spark.sql.Column) {
        case ((cl, i), acc) =>
          when(coalesce(cl.cond.getOrElse(lit(true)), lit(false)),
            lit(i)).otherwise(acc)
      }
    // apply an update/delete clause chain to rows: drop rows whose
    // first clause is a delete, rewrite columns per the first update
    def applyChain(rows: DataFrame,
        clauses: Seq[MergeClause]): DataFrame = {
      if (clauses.isEmpty) return rows.select(dataCols.map(col): _*)
      val tagged = rows.withColumn("__act", actIdx(clauses))
      val delIdx = clauses.zipWithIndex.collect {
        case (c, i) if c.kind == "delete" => i
      }
      val kept =
        if (delIdx.isEmpty) tagged
        else tagged.filter(!col("__act").isin(delIdx.map(Integer.valueOf): _*))
      kept.select(dataFields.map { f =>
        clauses.zipWithIndex.collect {
          case (c, i) if c.kind == "update" =>
            (i, c.sets.toMap.get(f.name))
        }.foldRight(col(f.name)) {
          case ((i, setV), acc) => setV match {
            case Some(v) =>
              when(col("__act") === i, v.cast(f.dataType)).otherwise(acc)
            case None => acc
          }
        }.as(f.name)
      }.toIndexedSeq: _*)
    }
    // matched target rows: cardinality-checked inner join when any
    // matched clause exists; a bare semi join (no duplication, no
    // rewrite) when only the other clause kinds are present
    val matchedRows =
      if (matched.isEmpty) aff.join(src, cond, "left_semi")
        .select(dataCols.map(col): _*)
      else {
        val m = aff.join(src, cond, "inner")
        val dup = m.groupBy(col("_f"), col("_pos"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
          .limit(1).count()
        if (dup > 0) throw new IllegalArgumentException(
          "MERGE cardinality violation: a target row matched more " +
            "than one source row")
        applyChain(m, matched)
      }
    val unmatchedRows = applyChain(
      aff.join(src, cond, "left_anti"), notMatchedBySource)
    // inserts: source rows matching NOTHING in the whole table
    val insertRows =
      if (notMatched.isEmpty) None
      else {
        val miss = src.join(visible, cond, "left_anti")
          .withColumn("__act", actIdx(notMatched))
          .filter(col("__act") =!= -1)
        Some(miss.select(dataFields.map { f =>
          notMatched.zipWithIndex.foldRight(
              lit(null).cast(f.dataType): org.apache.spark.sql.Column) {
            case ((c, i), acc) => c.sets.toMap.get(f.name) match {
              case Some(v) =>
                when(col("__act") === i, v.cast(f.dataType)).otherwise(acc)
              case None => acc
            }
          }.as(f.name)
        }.toIndexedSeq: _*))
      }
    val staged = insertRows
      .foldLeft(matchedRows.unionByName(unmatchedRows))(_ unionByName _)
    val v0 = readV + 1
    // rewritten survivors AND new rows land under the partition
    // layout the touched files carried
    val added = stageValidatedPartitioned(toPhysical(staged, m),
      dir, v0, pvalColsOf(affected), m)
    writeStats(spark, dir, stageRelOf(added), added,
      statsCols.map(m.physicalOf))
    val v = commitWithRetry(dir, added, affected, v0,
      rewriteConflicts(affected.toSet))
    maybeCheckpoint(spark, dir, v, checkpointEvery)
    v
  }

  /** Idempotent append at an EXPLICIT version — the exactly-once
    * streaming-sink protocol: `foreachBatch` maps micro-batch N to
    * version base+N+1; on restart a replayed batch finds its version
    * file already committed and becomes a no-op, so the table sees
    * every batch exactly once no matter how often the stream retries
    * (the IdempotentSink contract at file granularity). Returns true
    * if this call committed, false if the version already existed.
    * A replayed attempt's orphaned staging dir is reclaimed by
    * [[vacuum]].
    */
  def commitAppendAt(df: DataFrame, dir: String, version: Int,
      checkpointEvery: Int = DefaultCheckpointEvery): Boolean = {
    if (Files.exists(entryFile(dir, version))) return false
    assertWritable(dir)
    val m = mappingAt(dir)
    assertNoPhysicalCollision(df, m)
    val added = stageValidated(toPhysical(df, m), dir, version, m)
    try {
      writeEntry(dir, Entry(version, added, Seq.empty))
      maybeCheckpoint(df.sparkSession, dir, version, checkpointEvery)
      true
    }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }

  /** MERGE (upsert) commit: source rows REPLACE same-key rows, new
    * keys append — one commit. Only files containing a matched key
    * are rewritten (their unmatched rows re-land beside the full
    * source); every other file survives untouched, so merge cost
    * rides |affected files|, not table size.
    */
  def commitMerge(spark: SparkSession, dir: String, source: DataFrame,
      keyCol: String,
      checkpointEvery: Int = DefaultCheckpointEvery,
      statsCols: Seq[String] = Nil): Int = {
    assertWritable(dir)
    val readV = currentVersion(dir) // see commitDelete: the anchor
    val files = liveFilesFast(spark, dir, Some(readV))
    val dvs = dvRefsAt(dir, readV)
    val m = mappingAt(dir, readV)
    assertNoPhysicalCollision(source, m)
    def visible(fs: Seq[String]): DataFrame =
      visibleWithMeta(spark, dir, fs, dvs, m)
    // the suffix projection rides the SCAN; distinct + mapping stay
    // distributed, so the driver receives only the affected names the
    // log entry must carry (commitDelete's contract — no O(files^2)
    // suffix scan). DV-deleted rows are invisible to the key match
    // and never re-land (the rewrite materializes the file's DV).
    val keys = source.select(col(keyCol)).distinct()
    val affectedRel = visible(files)
      .join(broadcast(keys), Seq(keyCol), "left_semi")
      .select(col("_f"))
      .distinct().collect().map(_.getString(0)).toSet
    val affected = files.filter(f => affectedRel.contains(relSuffix(f)))
    val survivors =
      if (affected.isEmpty) source
      else visible(affected).drop("_f", "_pos")
        .join(broadcast(keys), Seq(keyCol), "left_anti")
        .unionByName(source)
    val v0 = readV + 1
    // staged rows = survivors + source; validating the union is a
    // superset of Delta's written-data rule (survivors passed at
    // their own commit and pass again for free)
    // survivors + new rows re-land under the affected partition dirs
    val added = stageValidatedPartitioned(toPhysical(survivors, m),
      dir, v0, pvalColsOf(affected), m)
    writeStats(spark, dir, stageRelOf(added), added,
      statsCols.map(m.physicalOf))
    val v = commitWithRetry(dir, added, affected, v0,
      rewriteConflicts(affected.toSet))
    maybeCheckpoint(spark, dir, v, checkpointEvery)
    v
  }

  /** Near-dup-aware MERGE (the Dedup x txlog composition): append
    * ONLY the batch rows that are near-duplicates of nothing — the
    * corpus is consulted through its persisted MinHash signature
    * index at `sigDir` ([[Dedup.minHashIndex]]'s (id, sig) store),
    * never re-read, never re-shingled. Keep-first semantics,
    * SQL-replayable by construction:
    *
    *  - a batch row whose ID is already indexed is dropped (replaying
    *    the same batch is a no-op — idempotent ingest);
    *  - a batch row banding with ANY indexed signature at
    *    `estimated jaccard >= threshold` is dropped (the corpus copy
    *    arrived first);
    *  - within the batch, the GREEDY pair rule: row b is dropped when
    *    some smaller-id batch row a matches it — non-recursive (b
    *    stays dropped even if a was itself dropped), which is the Lee
    *    et al. style approximation that an independent replay can
    *    re-derive without computing connected components.
    *
    * Survivors land as one atomic append and THEIR signatures extend
    * the index, so the next batch dedups against them too. The index
    * write is not transactional with the commit — it is a DERIVED
    * artifact, rebuildable from the table; a crash between the two
    * at worst re-admits a duplicate that the next OPTIMIZE-side
    * rebuild removes. Cost per ingest rides |batch| + the bucket
    * join against |index| narrow (id, sig) rows — the table's text
    * is never touched.
    */
  def commitMergeNearDup(spark: SparkSession, dir: String,
      sigDir: String, batch: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, bands: Int = 16, rowsPerBand: Int = 4,
      checkpointEvery: Int = DefaultCheckpointEvery,
      statsCols: Seq[String] = Nil): Int = {
    val batchSig = Dedup
      .minHashSignature(batch, idCol, textCol, n, bands * rowsPerBand)
      .cache()
    val sigPath = new org.apache.hadoop.fs.Path(sigDir)
    val sigFs = sigPath.getFileSystem(
      spark.sessionState.newHadoopConf())
    val index =
      if (sigFs.exists(sigPath))
        Some(spark.read.parquet(sigDir).select(col("id"), col("sig")))
      else None
    val internalDrops = Dedup
      .pairsAgainstSigs(batchSig, batchSig, threshold, bands, rowsPerBand)
      .filter(col("a") < col("b")).select(col("b").as("id"))
    val drops = index match {
      case None => internalDrops
      case Some(idx) =>
        val exactIdDrops = batchSig.select(col("id"))
          .join(idx.select(col("id")), Seq("id"), "left_semi")
        val corpusDrops = Dedup
          .pairsAgainstSigs(idx, batchSig, threshold, bands, rowsPerBand)
          .select(col("b").as("id"))
        exactIdDrops.unionAll(corpusDrops).unionAll(internalDrops)
    }
    val dropIds = drops.distinct().cache()
    val survivors = batch
      .join(dropIds.withColumnRenamed("id", idCol), Seq(idCol),
        "left_anti")
    if (survivors.isEmpty) return currentVersion(dir)
    val v = commitAppend(survivors, dir, checkpointEvery, statsCols)
    batchSig.join(dropIds, Seq("id"), "left_anti")
      .write.mode("append").parquet(sigDir)
    v
  }

  /** [[commitMergeNearDup]]'s sibling on the EXACT-MATCH axis:
    * append only batch rows that share no exact run of >= t chars
    * with the corpus, consulted through its persisted winnowing
    * fingerprint index at `fpDir` ([[Winnow.fingerprints]] output) —
    * never re-reading table text. Same SQL-replayable keep-first
    * protocol: already-indexed ids drop (idempotent replay), corpus
    * fingerprint matches (>= minShared shared selections) drop, and
    * within the batch the greedy smaller-id-wins pair rule applies;
    * survivors land atomically and THEIR fingerprints extend the
    * index. Detection has no false negatives at the t threshold (the
    * winnowing guarantee); the fp join ships narrow integer rows.
    *
    * Precondition for idempotent replay: rows shorter than t chars
    * carry no fingerprints, so they always survive — replaying a
    * batch containing them would re-append them. Gate such rows
    * upstream (a < t-char document is below the dedup threshold by
    * definition).
    */
  def commitMergeExactSub(spark: SparkSession, dir: String,
      fpDir: String, batch: DataFrame, idCol: String, textCol: String,
      k: Int = 8, t: Int = 32, minShared: Long = 1L, maxDf: Long = 64L,
      checkpointEvery: Int = DefaultCheckpointEvery,
      statsCols: Seq[String] = Nil): Int = {
    val batchFp = Winnow.fingerprints(batch, idCol, textCol, k, t)
      .cache()
    val fpPath = new org.apache.hadoop.fs.Path(fpDir)
    val fpFs = fpPath.getFileSystem(spark.sessionState.newHadoopConf())
    val index =
      if (fpFs.exists(fpPath)) Some(spark.read.parquet(fpDir))
      else None
    val internalDrops = Winnow
      .matchesSigs(batchFp, batchFp, minShared, maxDf)
      .filter(col("a") < col("b")).select(col("b").as("id"))
    val drops = index match {
      case None => internalDrops
      case Some(idx) =>
        val exactIdDrops = batch
          .select(col(idCol).cast("long").as("id")).distinct()
          .join(idx.select(col("did").as("id")).distinct(),
            Seq("id"), "left_semi")
        val corpusDrops = Winnow
          .matchesSigs(idx, batchFp, minShared, maxDf)
          .select(col("b").as("id"))
        exactIdDrops.unionAll(corpusDrops).unionAll(internalDrops)
    }
    val dropIds = drops.distinct().cache()
    val survivors = batch
      .join(dropIds.withColumnRenamed("id", idCol), Seq(idCol),
        "left_anti")
    if (survivors.isEmpty) return currentVersion(dir)
    val v = commitAppend(survivors, dir, checkpointEvery, statsCols)
    batchFp.join(dropIds.withColumnRenamed("id", "did"), Seq("did"),
        "left_anti")
      .write.mode("append").parquet(fpDir)
    v
  }

  /** Rebuild the derived MinHash signature index from the table
    * snapshot — the recovery path for a crash between a
    * [[commitMergeNearDup]] commit and its index append: the index
    * is DERIVED state, so consistency is restored by one pass over
    * the live rows (never the log). Run it like OPTIMIZE —
    * occasionally, or after a suspected partial ingest.
    */
  def rebuildNearDupIndex(spark: SparkSession, dir: String,
      sigDir: String, idCol: String, textCol: String, n: Int,
      bands: Int = 16, rowsPerBand: Int = 4): Unit = {
    val tmp = sigDir + ".rebuild"
    Dedup.minHashSignature(
        snapshot(spark, dir).select(col(idCol), col(textCol)),
        idCol, textCol, n, bands * rowsPerBand)
      .write.mode("overwrite").parquet(tmp)
    swapDir(spark, tmp, sigDir)
  }

  /** [[rebuildNearDupIndex]]'s sibling for the winnowing fingerprint
    * store behind [[commitMergeExactSub]].
    */
  def rebuildWinnowIndex(spark: SparkSession, dir: String,
      fpDir: String, idCol: String, textCol: String,
      k: Int = 8, t: Int = 32): Unit = {
    val tmp = fpDir + ".rebuild"
    Winnow.fingerprints(
        snapshot(spark, dir).select(col(idCol), col(textCol)),
        idCol, textCol, k, t)
      .write.mode("overwrite").parquet(tmp)
    swapDir(spark, tmp, fpDir)
  }

  /** Replace `dst` with `tmp` via rename — not atomic across both
    * steps, but the rebuild source is the TABLE, so re-running after
    * any crash converges; writing to a side dir first means a failed
    * rebuild never leaves a half-written index in place.
    */
  private def swapDir(spark: SparkSession, tmp: String,
      dst: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(conf)
    val (tp, dp) = (new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(dst))
    if (fs.exists(dp)) { fs.delete(dp, true); () }
    fs.rename(tp, dp)
    ()
  }

  /** Compaction commit (OPTIMIZE): rewrite the current live set into
    * `targetFiles` files and swap atomically — readers at older
    * versions still see the old files (they are removed from the
    * LOG, not the disk), so time travel survives compaction.
    */
  def commitCompact(spark: SparkSession, dir: String,
      targetFiles: Int,
      checkpointEvery: Int = DefaultCheckpointEvery,
      statsCols: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil,
      zOrderBy: Seq[String] = Nil,
      zBits: Int = 16): Int = {
    require(zOrderBy.isEmpty || (zOrderBy.size >= 2 && zOrderBy.size <= 6),
      "zOrderBy takes 2..6 columns (Morton interleave)")
    require(zOrderBy.isEmpty || clusterBy.isEmpty,
      "choose clusterBy (one axis) or zOrderBy (multi-axis), not both")
    assertWritable(dir)
    val readV = currentVersion(dir) // see commitDelete: the anchor
    val files = liveFilesFast(spark, dir, Some(readV))
    val v0 = readV + 1
    // compaction reads VISIBLE rows (DVs applied) — it materializes
    // any deletion vectors on its inputs, which then become inert
    // because the inputs leave the live set; row visibility is
    // unchanged, so dataChange=false stays truthful. On a mapped
    // table it reads the LOGICAL view (cluster keys are user-facing
    // names; dropped columns materialize away) and stages physical
    val m = mappingAt(dir, readV)
    val current = readApplyingDv(spark, dir, files, dvRefsAt(dir, readV),
      mapping = m)
    // clusterBy = OPTIMIZE's clustering axis: range-partition so each
    // output file owns a tight [min,max] slice of the cluster columns
    // — what makes the per-file stats actually selective (Delta's
    // OPTIMIZE ZORDER intent on one axis). zOrderBy = the TWO-axis
    // variant: range-partition on the Morton interleave so each file
    // owns a tight box in BOTH dimensions and the per-file min/max
    // sidecars prune on either key (OPTIMIZE ZORDER proper —
    // [[Layout.zOrdered]] composed with the commit protocol).
    // a partitioned table's OPTIMIZE must re-land rows under their
    // partition directories or it would silently strip pruning from
    // the whole table (the sweep/DML verbs preserve the layout too)
    val pvalCols = pvalColsOf(files)
    require(pvalCols.isEmpty || (clusterBy.isEmpty && zOrderBy.isEmpty),
      "clusterBy/zOrderBy OPTIMIZE on hive-partitioned files is not " +
        "supported (the partition layout already bounds each file)")
    val arranged =
      if (zOrderBy.nonEmpty)
        // N-way interleave (n=2 is the classic pair layout); per-key
        // bucket width shrinks with n so the total z stays in a long
        Layout.zOrderedScaledN(current, zOrderBy, targetFiles,
          math.min(zBits, 62 / zOrderBy.size)).drop("zval")
      else if (pvalCols.nonEmpty) current
      else if (clusterBy.isEmpty) current.repartition(targetFiles)
      else current.repartitionByRange(targetFiles,
        clusterBy.map(col).toIndexedSeq: _*)
    val added = stagePartitioned(toPhysical(arranged, m), dir, v0,
      pvalCols)
    writeStats(spark, dir, stageRelOf(added), added,
      statsCols.map(m.physicalOf))
    val v = commitWithRetry(dir, added, files, v0,
      compactConflicts(files.toSet), dataChange = false)
    maybeCheckpoint(spark, dir, v, checkpointEvery)
    v
  }

  /** Incremental OPTIMIZE: compact ONLY live files smaller than
    * `smallBytes` into ~`targetBytes` outputs; files already at size
    * survive untouched — the form of OPTIMIZE that works at 100 TB,
    * where rewriting the whole live set (what [[commitCompact]] does)
    * is a non-starter and the steady-state job is sweeping up the
    * small files streaming ingest leaves behind (Delta's
    * minFileSize/maxFileSize bin-packing). Needs at least two small
    * files to be worth a commit. Reads VISIBLE rows (DVs on the
    * inputs are materialized, same as [[commitCompact]]);
    * `dataChange=false` — the feed skips it. File sizes come from one
    * filesystem listing of the live set (driver-bounded, the same
    * O(files) contract as the log itself).
    */
  def commitCompactSmall(spark: SparkSession, dir: String,
      smallBytes: Long, targetBytes: Long = 128L * 1024 * 1024,
      checkpointEvery: Int = DefaultCheckpointEvery,
      statsCols: Seq[String] = Nil,
      zOrderBy: Seq[String] = Nil, zBits: Int = 16,
      targetFiles: Option[Int] = None): Int = {
    require(zOrderBy.isEmpty || (zOrderBy.size >= 2 && zOrderBy.size <= 6),
      "zOrderBy takes 2..6 columns (Morton interleave)")
    assertWritable(dir)
    val readV = currentVersion(dir) // see commitDelete: the anchor
    val files = liveFilesFast(spark, dir, Some(readV))
    val base = dataDir(dir).toString
    val conf = spark.sessionState.newHadoopConf()
    // sizes via ONE listStatus per stage DIRECTORY, not one RPC per
    // file — at 10^6 live files a per-file getFileStatus loop is
    // minutes of serial NameNode round-trips before any work starts
    val byDir = files.groupBy { f =>
      val p = absPath(base, f)
      p.substring(0, p.lastIndexOf('/'))
    }
    val sized = byDir.toSeq.flatMap { case (d, fs) =>
      val dp = new org.apache.hadoop.fs.Path(d)
      val lens = dp.getFileSystem(conf).listStatus(dp)
        .map(st => st.getPath.getName -> st.getLen).toMap
      // a logged live file absent from the listing (racing vacuum, an
      // external delete) is skipped, not crashed on: it cannot be
      // compacted, and any SNAPSHOT will already fail loudly on it —
      // a maintenance sweep should not be the thing that dies
      fs.flatMap(f =>
        lens.get(f.substring(f.lastIndexOf('/') + 1)).map(f -> _))
    }
    val small = sized.filter(_._2 < smallBytes)
    if (small.size < 2) return currentVersion(dir)
    val inputs = small.map(_._1)
    val outFiles = targetFiles.getOrElse(math.max(1,
      math.ceil(small.map(_._2).sum.toDouble / targetBytes).toInt))
    val v0 = readV + 1
    val m = mappingAt(dir, readV)
    val current = readApplyingDv(spark, dir, inputs, dvRefsAt(dir, readV),
      mapping = m)
    // a partitioned table's sweep must re-land rows under their
    // partition directories (mixing partitions into one output file
    // would silently strip partition pruning from the swept rows) —
    // stagePartitioned recreates the layout from the data columns,
    // one output file per partition per sweep
    val pvalCols = inputs.flatMap(f => partitionValuesOf(f).keys)
      .distinct // physical names
    require(zOrderBy.isEmpty || pvalCols.isEmpty,
      "zOrderBy sweep on hive-partitioned files is not supported " +
        "(the partition layout already bounds each output file)")
    // incremental ZORDER: the steady-state sweep re-clusters ONLY the
    // swept bin's rows on the Morton interleave, so clustering
    // SURVIVES continuous ingest without ever paying a full-table
    // OPTIMIZE — each swept output owns a tight box in every z key
    // and the per-file min/max stats prune on any of them
    val arranged =
      if (zOrderBy.nonEmpty)
        Layout.zOrderedScaledN(current, zOrderBy, outFiles,
          math.min(zBits, 62 / zOrderBy.size)).drop("zval")
      else if (pvalCols.nonEmpty) current
      else current.repartition(outFiles)
    val added =
      if (pvalCols.isEmpty) stage(toPhysical(arranged, m), dir, v0)
      else stagePartitioned(toPhysical(arranged, m), dir, v0, pvalCols)
    writeStats(spark, dir, stageRelOf(added), added,
      statsCols.map(m.physicalOf))
    val v = commitWithRetry(dir, added, inputs, v0,
      compactConflicts(inputs.toSet), dataChange = false)
    maybeCheckpoint(spark, dir, v, checkpointEvery)
    v
  }

  /** Commit history (DESCRIBE HISTORY): one row per version with add/
    * remove counts — the audit surface; driver-side, bounded by
    * commit count like the log itself.
    */
  def history(dir: String): Seq[(Int, Int, Int)] =
    readEntries(dir).map(e => (e.version, e.adds.size, e.removes.size))

  /** History with the dataChange flag — the SQL audit surface's row
    * shape (`txlog.`root#history``).
    */
  def historyFull(dir: String): Seq[(Int, Int, Int, Boolean)] =
    readEntries(dir).map(e =>
      (e.version, e.adds.size, e.removes.size, e.dataChange))

  /** VACUUM: physically delete data files no longer referenced by any
    * version ≥ `retainFrom` — the storage-reclaim step that TRADES
    * AWAY time travel older than the horizon (exactly Delta's
    * contract). Files still referenced by any retained version
    * survive; returns the deleted file names. Also reclaims ORPHANED
    * staging directories — dirs no log entry ever referenced (lost
    * races, replayed stream batches). Like Delta's vacuum, this must
    * not run concurrently with an in-flight writer (whose stage is
    * indistinguishable from an orphan until its log entry lands).
    */
  def vacuum(dir: String, retainFrom: Int,
      tempRetainMillis: Long = 7L * 24 * 3600 * 1000): Seq[String] = {
    val entries = readEntries(dir)
    val latest = entries.lastOption.map(_.version).getOrElse(0)
    val keep = (retainFrom to latest)
      .flatMap(v => liveFiles(dir, Some(v))).toSet
    val all = entries.flatMap(_.adds).toSet
    // absolute references (a shallow clone's view of its SOURCE's
    // files) are never this table's to delete — Paths.resolve with an
    // absolute arg would otherwise reach straight into the source
    val dead = (all -- keep).toSeq.sorted
      .filterNot(f => f.startsWith("/") || f.contains("://"))
    dead.foreach { f =>
      Files.deleteIfExists(dataDir(dir).resolve(f)); ()
    }
    // orphaned staging dirs: under data/ but absent from every log
    // entry's adds. Referenced names are EVERY non-basename path
    // segment of every add: the first segment is a local add's stage
    // dir, intermediate segments cover hive partition dirs
    // (stage/__p_c=v/part.parquet — keying off the 2-segment suffix
    // here once misclassified every partitioned stage as an orphan),
    // and an ABSOLUTE reference (a clone's inherited file)
    // contributes its source stage name too — otherwise the clone's
    // vacuum would reclaim the inherited stats sidecars (keyed by
    // source stage name) as orphans
    val referenced = all.flatMap(f => f.split('/').dropRight(1))
    // an IN-FLIGHT writer's stage (files landed, log entry not yet)
    // is byte-identical to a crash leftover — the retention window is
    // the only separator (Delta's uncommitted-file retention), and it
    // is what makes VACUUM safe to run CONCURRENTLY with writers: a
    // live stage is milliseconds old, a lost race is not
    val tmpHorizon = System.currentTimeMillis() - tempRetainMillis
    def isOld(p: Path): Boolean =
      try Files.getLastModifiedTime(p).toMillis < tmpHorizon
      catch { case _: java.io.IOException => false } // just vanished
    // a DIRECTORY ages by the newest mtime in its TREE, not its own:
    // a partitioned stage's files land in partition subdirs, so the
    // top-level stage dir's mtime stays at creation time — aging it
    // by itself would let a vacuum reclaim the live stage of any
    // single commit running longer than the retention window
    def isOldTree(p: Path): Boolean =
      isOld(p) && (!Files.isDirectory(p) || listDir(p).forall(isOldTree))
    val orphans = listDir(dataDir(dir))
      .filter(p => Files.isDirectory(p) &&
        !referenced.contains(p.getFileName.toString) && isOldTree(p))
    orphans.foreach(deleteDirRec) // may hold partition subdirs
    // stats sidecars of orphaned stages go with them (a committed
    // stage's sidecar stays even if some of its files were vacuumed —
    // pruning filters by live files, so stale rows are inert). Same
    // retention guard: an in-flight writer writes its sidecar BEFORE
    // its log entry lands
    listDir(logDir(dir))
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("stats-") &&
          !referenced.contains(n.stripPrefix("stats-")) && isOldTree(p)
      }
      .foreach { d =>
        listDir(d).foreach(f => { Files.deleteIfExists(f); () })
        Files.deleteIfExists(d); ()
      }
    // now-empty referenced dirs (all files vacuumed) go too —
    // bottom-up so an emptied partition dir empties its stage dir.
    // Stages THIS vacuum deleted from are fair game regardless of
    // age (the deletions just refreshed their mtime); anything else
    // empty must be old — a writer's just-created, not-yet-populated
    // stage dir is empty and NOT ours to reap
    val touched = dead.map(_.split('/').head).toSet
    def sweepEmpty(p: Path, inTouched: Boolean): Unit = {
      listDir(p).filter(Files.isDirectory(_)).foreach(c =>
        sweepEmpty(c, inTouched ||
          (p == dataDir(dir) && touched.contains(c.getFileName.toString))))
      if (p != dataDir(dir) && listDir(p).isEmpty &&
          (inTouched || isOld(p))) {
        Files.deleteIfExists(p); ()
      }
    }
    sweepEmpty(dataDir(dir), inTouched = false)
    // stale commit-attempt temp files and checkpoint temp dirs (a
    // writer that crashed between write and link/rename) are orphans —
    // but ONLY past a retention window: a LIVE writer mid-writeEntry
    // (tmp written, hard link not yet created) or a checkpoint
    // mid-build is byte-identical to a crash leftover, and reclaiming
    // it fails the in-flight commit with a non-retryable
    // NoSuchFileException. Age is the only separator (Delta's
    // uncommitted-file retention takes the same view); an in-flight
    // temp lives milliseconds, a crash leftover forever.
    listDir(logDir(dir))
      .filter(_.getFileName.toString.startsWith("."))
      .filterNot(_.getFileName.toString == "_last_checkpoint")
      .filter(isOldTree) // tree-aged: a ckpt temp DIR mid-build has
      .foreach(deleteDirRec) // fresh children under an old dir mtime
    // deletion-vector sidecars: a DV dir is dead when NO retained
    // version's DV state references it (purged, restored-over, or
    // past the horizon) — one incremental replay over the log, the
    // same O(commits) contract as the file-set pass above
    val retainedDvs = {
      var dvs = Vector.empty[String]
      val acc = scala.collection.mutable.Set.empty[String]
      entries.foreach { e =>
        if (e.dvReset) dvs = Vector.empty
        dvs = dvs ++ e.dvs
        if (e.version >= retainFrom) acc ++= dvs
      }
      if (latest >= retainFrom) acc ++= dvs
      acc.toSet
    }
    val deadDvs = listDir(logDir(dir))
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("dv-") &&
        !retainedDvs.contains(p.getFileName.toString))
    deadDvs.foreach(deleteDirRec)
    dead ++ orphans.map(o => o.getFileName.toString + "/") ++
      deadDvs.map(_.getFileName.toString + "/")
  }

  // ---------------------------------------------------------------
  // Deletion vectors (merge-on-read deletes), RESTORE, CLONE
  // ---------------------------------------------------------------

  /** Resolve a DV reference against this table's log dir; absolute
    * references (a shallow clone inheriting the source's DVs) pass
    * through.
    */
  private def dvPath(dir: String, name: String): String =
    if (name.startsWith("/") || name.contains("://")) name
    else s"${logDir(dir)}/$name"

  private val CkptSidecarName = "_dvrefs.json"

  private def ckptDvFile(dir: String, v: Int): Path =
    ckptDir(dir, v).resolve(CkptSidecarName)

  /** Fold the DV state forward over the log suffix (`after`, `upTo`]:
    * `dvReset` entries (RESTORE, PURGE) clear the accumulated list
    * before contributing their own.
    */
  private def dvRefsFrom(dir: String, seed: Vector[String],
      after: Int, upTo: Int): Vector[String] = {
    var dvs = seed
    readEntries(dir, after = after, upTo = upTo).foreach { e =>
      if (e.dvReset) dvs = Vector.empty
      dvs = dvs ++ e.dvs
    }
    dvs
  }

  /** DV references in force as of `upTo`, seeded from the newest
    * checkpoint ≤ `upTo` that carries a DV sidecar, then replaying
    * only the log suffix — same O(suffix) contract as
    * [[liveFilesFast]] (pre-sidecar checkpoints fall back to the full
    * replay, which stays the semantic oracle).
    */
  def dvRefsAt(dir: String,
      upTo: Int = Int.MaxValue): Seq[String] = {
    val seedV = ckptVersions(dir)
      .filter(v => v <= upTo && Files.exists(ckptDvFile(dir, v)))
      .lastOption
    seedV match {
      case None => dvRefsFrom(dir, Vector.empty, after = 0, upTo = upTo)
      case Some(cv) =>
        val s = new String(Files.readAllBytes(ckptDvFile(dir, cv)),
          "UTF-8")
        // suffix reads never parse pre-checkpoint entries, so the
        // read gate must fire off the sidecar's recorded protocol
        assertReadable(dir, sidecarProtocol(s))
        dvRefsFrom(dir, jsonArr(s, "dvs").toVector, after = cv,
          upTo = upTo)
    }
  }

  /** Union of DV rows — `(file: 2-segment suffix, pos: row index)`. */
  private def readDv(spark: SparkSession, dir: String,
      refs: Seq[String]): DataFrame =
    spark.read.parquet(refs.map(dvPath(dir, _)): _*)
      .select(col("file"), col("pos"))

  /** Attach the identity a DV keys on: `_f` = the file's 2-segment
    * path suffix, `_pos` = the parquet row index (`_metadata
    * .row_index` — stable per immutable file, which is what makes
    * position-based DVs sound on a table whose files never mutate).
    */
  private def withMeta(df: DataFrame): DataFrame =
    df.withColumn("_f",
        regexp_extract(col("_metadata.file_path"), "([^/]+/[^/]+)$", 1))
      .withColumn("_pos", col("_metadata.row_index"))

  /** The merge-on-read step: drop rows whose (file, pos) a DV holds.
    * A plain anti-join — distributed, keyed narrow rows; AQE
    * broadcasts it when the DV is small (the usual case).
    */
  private def applyDv(rows: DataFrame, dv: DataFrame): DataFrame =
    rows.join(dv.select(col("file").as("_f"), col("pos").as("_pos")),
      Seq("_f", "_pos"), "left_anti")

  /** Raw scan of `files` with `_f`/`_pos` attached, prior DVs
    * applied, projected to the LOGICAL view (meta passes through) —
    * the shared read every rewriting verb starts from.
    */
  private def visibleWithMeta(spark: SparkSession, dir: String,
      files: Seq[String], dvs: Seq[String],
      m: ColumnMapping): DataFrame = {
    val base = dataDir(dir).toString
    val raw = withMeta(spark.read
      .option("mergeSchema", m.active.toString)
      .parquet(files.map(absPath(base, _)): _*))
    val vis =
      if (dvs.isEmpty) raw else applyDv(raw, readDv(spark, dir, dvs))
    toLogical(vis, m)
  }

  /** Read `files` applying the given DV refs; the no-DV fast path is
    * byte-identical to a plain scan (no metadata columns, no join) so
    * DV support costs nothing on tables that never used it.
    */
  private def readApplyingDv(spark: SparkSession, dir: String,
      files: Seq[String], dvs: Seq[String],
      mergeSchema: Boolean = false,
      mapping: ColumnMapping = NoMapping): DataFrame = {
    val base = dataDir(dir).toString
    // a mapped table's files can span schema eras (a rewrite after a
    // DROP omits the physical column) — always merge their schemas
    val raw = spark.read
      .option("mergeSchema", (mergeSchema || mapping.active).toString)
      .parquet(files.map(absPath(base, _)): _*)
    val vis =
      if (dvs.isEmpty) raw
      else {
        val cols = raw.columns.toSeq
        applyDv(withMeta(raw), readDv(spark, dir, dvs))
          .select(cols.map(col): _*)
      }
    toLogical(vis, mapping)
  }

  /** Logical-view read of specific log files — the streaming source's
    * per-commit adds (raw file contents as-at-commit-time, Delta's
    * streaming-read contract: later DVs never retro-change an already
    * emitted batch).
    */
  private[graft] def readAddedFiles(spark: SparkSession, dir: String,
      files: Seq[String]): DataFrame =
    readApplyingDv(spark, dir, files, Seq.empty,
      mergeSchema = false, mapping = mappingAt(dir))

  /** Entry metadata the streaming source needs, per version in
    * (`after`, `upTo`]: (version, adds, hasRemoves, hasDvs,
    * dataChange).
    */
  private[graft] def entrySummaries(dir: String, after: Int, upTo: Int)
      : Seq[(Int, Seq[String], Boolean, Boolean, Boolean)] =
    readEntries(dir, after = after, upTo = upTo).map(e =>
      (e.version, e.adds, e.removes.nonEmpty,
        e.dvs.nonEmpty || e.dvReset, e.dataChange))

  private def deleteDirRec(p: Path): Unit = {
    listDir(p).foreach { c =>
      if (Files.isDirectory(c)) deleteDirRec(c)
      else { Files.deleteIfExists(c); () }
    }
    Files.deleteIfExists(p)
    ()
  }

  /** Merge-on-read DELETE: record matching rows' (file, pos) in a
    * deletion-vector parquet and commit ONLY the DV reference — no
    * data file is rewritten, so a 0.1% delete on a 100 TB table
    * writes kilobytes instead of re-staging terabytes (Delta's
    * deletion vectors / Iceberg's position deletes). Readers
    * anti-join the DV at scan time ([[snapshot]]); [[commitPurgeDVs]]
    * materializes accumulated DVs back into clean files. Already
    * DV-deleted rows are invisible to the predicate scan, so stacked
    * DV deletes never double-record a row. Same conflict matrix as
    * the rewriting delete: interleaved adds carry unscanned rows,
    * interleaved removes of a file we DV'd would resurrect/lose rows.
    */
  def commitDeleteDV(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column,
      checkpointEvery: Int = DefaultCheckpointEvery): Int =
    commitDvOf(spark, dir, checkpointEvery,
      visible => visible.filter(coalesce(pred, lit(false))))

  /** Merge-on-read delete by KEY SET — the erasure-request shape
    * (GDPR right-to-be-forgotten over a 100 TB table): the key batch
    * semi-joins the visible rows to their (file, pos) positions, so
    * the request stream never collects to the driver and the table
    * never rewrites a file. A replayed batch finds its rows already
    * DV-deleted (invisible) and becomes a version no-op — idempotent
    * by construction, the streaming-ingest requirement.
    */
  def commitDeleteDVKeys(spark: SparkSession, dir: String,
      keys: DataFrame, keyCol: String,
      checkpointEvery: Int = DefaultCheckpointEvery): Int =
    commitDvOf(spark, dir, checkpointEvery,
      visible => visible.join(
        broadcast(keys.select(col(keyCol)).distinct()),
        Seq(keyCol), "left_semi"))

  /** Shared DV-commit tail: `matchRows` maps the VISIBLE rows (with
    * `_f`/`_pos` attached, prior DVs applied) to the rows to delete.
    */
  private def commitDvOf(spark: SparkSession, dir: String,
      checkpointEvery: Int,
      matchRows: DataFrame => DataFrame): Int = {
    val prot = assertWritable(dir)
    // the FIRST deletion vector upgrades the table's protocol in the
    // SAME commit: from then on a DV-unaware engine hard-fails on
    // read instead of silently resurrecting deleted rows
    val protUp =
      if (prot.readerFeatures.contains("deletion-vectors")) None
      else Some(prot.upgradedWith(2, 2, Set("deletion-vectors"),
        Set("deletion-vectors")))
    val readV = currentVersion(dir) // see commitDelete: the anchor
    val files = liveFilesFast(spark, dir, Some(readV))
    val dvs = dvRefsAt(dir, readV)
    // DVs key on (file, pos) — name-independent — but the PREDICATE
    // speaks logical names, so match on the logical view
    val visible = visibleWithMeta(spark, dir, files, dvs,
      mappingAt(dir, readV))
    val v0 = readV + 1
    val name = f"dv-v$v0%05d-" +
      java.util.UUID.randomUUID.toString.take(8)
    matchRows(visible)
      .select(col("_f").as("file"), col("_pos").cast("long").as("pos"))
      .write.parquet(dvPath(dir, name))
    val written = spark.read.parquet(dvPath(dir, name))
    val affectedSuffix = written.select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet
    if (affectedSuffix.isEmpty) {
      deleteDirRec(Paths.get(dvPath(dir, name)))
      return currentVersion(dir)
    }
    val affected = files.filter(f => affectedSuffix.contains(relSuffix(f)))
    try {
      val v = commitWithRetry(dir, Seq.empty, Seq.empty, v0,
        dvDeleteConflicts(affected.toSet), dvs = Seq(name),
        protocol = protUp)
      maybeCheckpoint(spark, dir, v, checkpointEvery)
      v
    } catch {
      case e: CommitConflictException =>
        deleteDirRec(Paths.get(dvPath(dir, name))); throw e
    }
  }

  /** Materialize every in-force DV into rewritten files and clear the
    * DV state (Delta's `REORG TABLE ... APPLY (PURGE)`): files with a
    * DV row re-land minus their deleted positions; untouched files
    * survive. `dataChange=false` — no row's VISIBILITY changes, so
    * the change feed skips it, exactly like OPTIMIZE.
    */
  def commitPurgeDVs(spark: SparkSession, dir: String,
      checkpointEvery: Int = DefaultCheckpointEvery,
      statsCols: Seq[String] = Nil): Int = {
    assertWritable(dir)
    val readV = currentVersion(dir) // see commitDelete: the anchor
    val dvs = dvRefsAt(dir, readV)
    if (dvs.isEmpty) return currentVersion(dir)
    val files = liveFilesFast(spark, dir, Some(readV))
    val base = dataDir(dir).toString
    val dv = readDv(spark, dir, dvs)
    val affectedSuffix = dv.select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet
    val affected = files.filter(f => affectedSuffix.contains(relSuffix(f)))
    val v0 = readV + 1
    if (affected.isEmpty)
      // every DV'd file is already dead (rewritten since) — the DVs
      // are inert; just clear the references. The reset still
      // CONFLICTS with an interleaved DV commit: clearing a DV this
      // purge never saw would silently resurrect its deleted rows
      return commitWithRetry(dir, Seq.empty, Seq.empty, v0,
        dvResetConflicts, dataChange = false, dvReset = true)
    // purge is a PHYSICAL rewrite (no projection — lossless, keeps
    // every era's columns); mapped tables merge schemas across eras
    val raw = withMeta(spark.read
      .option("mergeSchema", mappingAt(dir, readV).active.toString)
      .parquet(affected.map(absPath(base, _)): _*))
    val rewritten = applyDv(raw, dv).drop("_f", "_pos")
    // purged files re-land under their partition dirs (pruning must
    // survive REORG APPLY PURGE like every other rewrite)
    val added = stagePartitioned(rewritten, dir, v0,
      pvalColsOf(affected))
    writeStats(spark, dir, stageRelOf(added), added, statsCols)
    val v = commitWithRetry(dir, added, affected, v0,
      compactConflicts(affected.toSet), dataChange = false,
      dvReset = true)
    maybeCheckpoint(spark, dir, v, checkpointEvery)
    v
  }

  /** RESTORE TABLE ... TO VERSION: one commit whose adds/removes set
    * the live file list back to `toVersion`'s, and whose DV state is
    * reset to `toVersion`'s exact DV refs — time travel made the
    * WRITABLE head (Delta's RESTORE). No data moves: the old files
    * still exist unless VACUUM passed, which is checked loudly. The
    * restore commit is itself dataChange history — versions after it
    * remain queryable, and the change feed reports its NET row diff.
    */
  def commitRestore(spark: SparkSession, dir: String, toVersion: Int,
      checkpointEvery: Int = DefaultCheckpointEvery): Int = {
    assertWritable(dir)
    val readV = currentVersion(dir) // see commitDelete: the anchor
    val target = liveFiles(dir, Some(toVersion))
    require(target.nonEmpty,
      s"nothing to restore: version $toVersion has no live files")
    val current = liveFilesFast(spark, dir, Some(readV))
    val curSet = current.toSet
    val tgtSet = target.toSet
    val adds = target.filterNot(curSet)
    val removes = current.filterNot(tgtSet)
    val base = dataDir(dir).toString
    val conf = spark.sessionState.newHadoopConf()
    val missing = adds.filterNot { f =>
      val p = new org.apache.hadoop.fs.Path(absPath(base, f))
      p.getFileSystem(conf).exists(p)
    }
    require(missing.isEmpty,
      s"cannot RESTORE to v$toVersion past the vacuum horizon: " +
        missing.take(3).mkString(", ") + " no longer exist")
    val targetDvs = dvRefsAt(dir, toVersion)
    // the horizon applies to DV SIDECARS too: vacuum reclaims DV dirs
    // no retained version references, and re-pointing at a reclaimed
    // one would break every subsequent snapshot
    val missingDvs = targetDvs.filterNot { r =>
      val p = new org.apache.hadoop.fs.Path(dvPath(dir, r))
      p.getFileSystem(conf).exists(p)
    }
    require(missingDvs.isEmpty,
      s"cannot RESTORE to v$toVersion past the vacuum horizon: " +
        s"deletion vector(s) ${missingDvs.take(3).mkString(", ")} " +
        "no longer exist")
    if (adds.isEmpty && removes.isEmpty &&
        targetDvs == dvRefsAt(dir, readV))
      return currentVersion(dir)
    val v = commitWithRetry(dir, adds, removes,
      readV + 1, rewriteConflicts(removes.toSet),
      dvs = targetDvs, dvReset = true)
    maybeCheckpoint(spark, dir, v, checkpointEvery)
    v
  }

  // ---------------------------------------------------------------
  // CHECK constraints (commit-time validation)
  // ---------------------------------------------------------------

  /** Raised when a commit would land rows violating a CHECK
    * constraint (Delta's `InvariantViolationException` contract).
    */
  final class ConstraintViolationException(msg: String)
    extends RuntimeException(msg)

  private def constraintsFile(dir: String): Path =
    logDir(dir).resolve("_constraints.jsonl")

  /** Active CHECK constraints: (name, SQL expression). The registry
    * is an append-only JSONL (adds and drops replayed in order) —
    * driver-sized like the log.
    */
  def checkConstraints(dir: String): Seq[(String, String)] = {
    val f = constraintsFile(dir)
    if (!Files.exists(f)) return Seq.empty
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, String]
    new String(Files.readAllBytes(f), "UTF-8").split('\n')
      .filter(_.nonEmpty).foreach { line =>
        // escape-aware string field: a constraint EXPRESSION often
        // contains double quotes (string literals) — scanning to the
        // first raw '"' would truncate at the escaped one and leave
        // an unparseable expr poisoning every later commit
        def field(k: String): Option[String] = {
          val i = line.indexOf("\"" + k + "\":\"")
          if (i < 0) None
          else {
            var j = i + k.length + 4
            val sb = new StringBuilder
            var inStr = true
            while (inStr) {
              val c = line.charAt(j)
              if (c == '\\') { sb.append(line.charAt(j + 1)); j += 2 }
              else if (c == '"') inStr = false
              else { sb.append(c); j += 1 }
            }
            Some(sb.toString)
          }
        }
        val name = field("name").getOrElse("")
        if (line.contains("\"drop\":true")) { acc.remove(name); () }
        else field("expr").foreach(e => acc(name) = e)
      }
    acc.toSeq
  }

  /** ALTER TABLE ... ADD CONSTRAINT ... CHECK (expr): validates the
    * CURRENT snapshot first (a constraint the existing data violates
    * is rejected, Delta's rule), then registers the expression so
    * every future append/merge enforces it. SQL CHECK semantics: a
    * row violates only when the expression is FALSE — NULL passes.
    */
  def addCheckConstraint(spark: SparkSession, dir: String, name: String,
      exprSql: String): Unit = {
    require(!name.contains("\"") && !name.contains("\n"),
      s"bad constraint name: $name")
    assertWritable(dir)
    if (currentVersion(dir) > 0) {
      val bad = snapshot(spark, dir)
        .filter(coalesce(expr(exprSql), lit(true)) === false).count()
      if (bad > 0) throw new ConstraintViolationException(
        s"cannot add CHECK $name ($exprSql): $bad existing row(s) violate it")
    }
    Files.createDirectories(logDir(dir))
    Files.write(constraintsFile(dir),
      (s"""{"name":"${esc(name)}","expr":"${esc(exprSql)}"}""" + "\n")
        .getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    ()
  }

  /** ALTER TABLE ... DROP CONSTRAINT. */
  def dropCheckConstraint(dir: String, name: String): Unit = {
    Files.write(constraintsFile(dir),
      (s"""{"name":"${esc(name)}","drop":true}""" + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    ()
  }

  /** Enforce every active constraint on the rows that ACTUALLY landed
    * in the staged files — ONE distributed aggregation over the staged
    * parquet counting violations per constraint (never collecting row
    * data); any violation deletes the stage and aborts the commit
    * (all-or-nothing). Validating the staged bytes instead of the
    * input DataFrame closes the non-determinism hole (a df built on
    * rand() or a re-read of changing input could pass a pre-stage
    * check yet stage violating rows — Delta enforces invariants on
    * the data actually written) AND drops the second full computation
    * of the input's lineage. No constraints → no job.
    */
  private def enforceConstraintsStaged(spark: SparkSession, dir: String,
      files: Seq[String], m: ColumnMapping): Unit = {
    val cs = checkConstraints(dir)
    if (cs.isEmpty || files.isEmpty) return
    val base = dataDir(dir).toString
    // constraint expressions speak logical names; staged files are
    // physical
    val staged = toLogical(
      spark.read.parquet(files.map(f => s"$base/$f"): _*), m)
    val counts = staged.agg(
      count(lit(1)).as("_n"),
      cs.map { case (n, e) =>
        // coalesce: sum over an EMPTY batch is NULL, and an empty
        // batch (a zero-row streaming micro-batch) is violation-free
        coalesce(sum(when(coalesce(expr(e), lit(true)) === false, 1L)
          .otherwise(0L)), lit(0L)).as(s"_viol_$n")
      }: _*).head()
    val bad = cs.zipWithIndex.flatMap { case ((n, e), i) =>
      val v = counts.getLong(i + 1)
      if (v > 0) Some(s"CHECK $n ($e): $v row(s)") else None
    }
    if (bad.nonEmpty) throw new ConstraintViolationException(
      "constraint violation, commit rejected: " + bad.mkString("; "))
  }

  /** Stage `df`, then validate the STAGED files against the table's
    * CHECK constraints; a violation removes the stage (and its never-
    * committed sidecar slot) before rethrowing, so a rejected commit
    * leaves no version and no bytes behind. The path every verb that
    * lands NEW row content takes (append / merge / update); pure
    * survivor re-arrangements (delete, compact, purge) keep plain
    * [[stage]] — their rows were validated when they first landed.
    */
  private def stageValidated(df: DataFrame, dir: String,
      v: Int, m: ColumnMapping): Seq[String] = {
    val added = stage(df, dir, v)
    try { enforceConstraintsStaged(df.sparkSession, dir, added, m); added }
    catch {
      case e: ConstraintViolationException =>
        if (added.nonEmpty)
          deleteDirRec(dataDir(dir).resolve(stageRelOf(added)))
        throw e
    }
  }

  /** Fully resolved scan paths for the DSv2/SQL surface (handles a
    * shallow clone's absolute references) — and LOUDLY rejects tables
    * with in-force deletion vectors: the ParquetTable scan path
    * cannot apply the DV anti-join, and silently resurrecting deleted
    * rows would be far worse than failing. Purge first
    * ([[commitPurgeDVs]]) or read through [[snapshot]].
    */
  def resolvedScanPaths(spark: SparkSession, root: String,
      version: Option[Int] = None): Seq[String] = {
    val refs = dvRefsAt(root, version.getOrElse(Int.MaxValue))
    require(refs.isEmpty,
      s"txlog table at $root has ${refs.size} in-force deletion " +
        "vector(s); the SQL scan surface cannot apply them — run " +
        "commitPurgeDVs (REORG APPLY PURGE) first or read via " +
        "TxTable.snapshot")
    require(!mappingAt(root, version.getOrElse(Int.MaxValue)).active,
      s"txlog table at $root uses column mapping (rename/drop); the " +
        "SQL scan surface would serve physical names — read via " +
        "TxTable.snapshot")
    val base = dataDir(root).toString
    liveFilesFast(spark, root, version).map(absPath(base, _))
  }

  /** Shallow CLONE: a new table whose first commit references the
    * source's live files (and DV refs) by ABSOLUTE path — zero bytes
    * copied (Delta's shallow clone). The clone owns its own log from
    * then on: appends land in its own data dir; deletes/merges
    * rewrite only affected files INTO the clone (copy-on-write), so
    * the source is never touched; OPTIMIZE localizes everything.
    * [[vacuum]] on the clone never deletes absolute (source-owned)
    * files; vacuum on the SOURCE can break clones older than its
    * horizon — Delta's documented shallow-clone hazard, inherited
    * deliberately.
    */
  def cloneShallow(spark: SparkSession, srcDir: String, dstDir: String,
      version: Option[Int] = None): Int = {
    require(currentVersion(dstDir) == 0,
      s"clone target $dstDir is not an empty table")
    val upTo = version.getOrElse(currentVersion(srcDir))
    val srcBase = dataDir(srcDir).toAbsolutePath.toString
    val adds = liveFiles(srcDir, Some(upTo)).map(absPath(srcBase, _))
    require(adds.nonEmpty, s"nothing to clone at version $upTo")
    val dvs = dvRefsAt(srcDir, upTo).map(dvPath(srcDir, _))
      .map(p => Paths.get(p).toAbsolutePath.toString)
    writeEntry(dstDir, Entry(1, adds, Seq.empty, dvs = dvs))
    // a clone inherits the TABLE METADATA, not just the file refs
    // (Delta's shallow clone copies metadata): the source's CHECK
    // constraints travel — otherwise the clone would silently accept
    // rows the source rejects — and its stats/bloom sidecars are
    // copied (tiny parquet, O(files) rows) so file skipping keeps
    // pruning the inherited files: sidecars key on the 2-segment path
    // suffix, which is identical under an absolute reference
    val srcCf = constraintsFile(srcDir)
    if (Files.exists(srcCf)) {
      Files.copy(srcCf, constraintsFile(dstDir),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    listDir(logDir(srcDir))
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("stats-"))
      .foreach { sd =>
        copyDirRec(sd, logDir(dstDir).resolve(sd.getFileName.toString))
      }
    1
  }

  private def copyDirRec(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    listDir(src).foreach { c =>
      if (Files.isDirectory(c)) copyDirRec(c, dst.resolve(c.getFileName))
      else {
        Files.copy(c, dst.resolve(c.getFileName.toString),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
  }

  // ---------------------------------------------------------------
  // Per-file stats + data skipping
  // ---------------------------------------------------------------

  private def statsDir(dir: String, stageRel: String): Path =
    logDir(dir).resolve(s"stats-$stageRel")

  /** Per-file Bloom parameters: 8192 bit positions × 4 probes. The
    * sidecar stores each file's SET of occupied positions as a sorted
    * int array (the sparse representation — ≤ bits entries, parquet-
    * encoded), so membership checks are plain `array_contains` in the
    * pruning predicate: no binary bit-twiddling, no UDF, and the false
    * -positive rate at n distinct values per file is the textbook
    * (1 - e^(-kn/m))^k. Position j of value v is
    * md5(j || cast(v as string)) — identical on the executor (Spark
    * `md5(concat(...))` during the stats pass) and on the driver
    * (when a query's literal is hashed to probe positions), so a
    * bloom check can never diverge from the data.
    */
  private val BloomBits = 8192
  private val BloomK = 4

  private[operators] def bloomPositions(v: Any): Seq[Int] =
    (0 until BloomK).map { j =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((j.toString + v.toString).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % BloomBits).toInt
    }

  private def bloomPosArray(c: String): org.apache.spark.sql.Column =
    array((0 until BloomK).map(j =>
      pmod(conv(substring(md5(concat(lit(j.toString),
          col(c).cast("string"))), 1, 15), 16, 10).cast("bigint"),
        lit(BloomBits.toLong)).cast("int")): _*)

  /** Write per-file (n_rows, min/max per stats column) for one staged
    * commit as a tiny parquet sidecar keyed by the unique stage-dir
    * name — Delta's stats-in-the-add-action contract, kept out of the
    * JSON log so the log parser stays trivial and the stats stay
    * distributed-scannable. Written BEFORE the commit point (like the
    * data files), so a committed version always has its stats; a lost
    * race's sidecar is an orphan [[vacuum]] reclaims. One columnar
    * pass over ONLY the staged files (min/max of the stats columns —
    * column pruning makes this cheap relative to the write itself).
    */
  private def writeStats(spark: SparkSession, dir: String,
      stageRel: String, files: Seq[String],
      statsCols: Seq[String], bloomCols: Seq[String] = Nil): Unit = {
    if ((statsCols.isEmpty && bloomCols.isEmpty) || files.isEmpty) return
    val base = dataDir(dir).toString
    // "__sfile" avoids clobbering a user column named "file"; the
    // sidecar's key is renamed to "file" at the end
    val staged = spark.read.parquet(files.map(f => s"$base/$f"): _*)
      .withColumn("__sfile",
        regexp_extract(input_file_name(), "([^/]+/[^/]+)$", 1))
    val aggs = count(lit(1)).as("n_rows") +:
      statsCols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val mm = staged.groupBy(col("__sfile").as("file"))
      .agg(aggs.head, aggs.tail: _*)
    // bloom = the SET of occupied positions per file, built via
    // explode + distinct so per-group state is bounded by BloomBits
    // ints, never by row count (a collect over raw rows would hold
    // k·n_rows elements per file pre-dedup)
    val withBlooms = bloomCols.foldLeft(mm) { (acc, c) =>
      acc.join(
        staged.select(col("__sfile").as("file"),
            explode(bloomPosArray(c)).as("pos"))
          .distinct()
          .groupBy(col("file"))
          .agg(sort_array(collect_set(col("pos"))).as(s"bloom_$c")),
        Seq("file"), "left")
    }
    withBlooms.coalesce(1)
      .write.mode("overwrite").parquet(statsDir(dir, stageRel).toString)
  }

  /** All stats sidecars as one DataFrame (mergeSchema: different
    * commits may carry different stats columns), or None if the table
    * has never written stats.
    */
  private def statsTable(spark: SparkSession, dir: String)
      : Option[DataFrame] = {
    val dirs = listDir(logDir(dir))
      .filter(_.getFileName.toString.startsWith("stats-"))
      .map(_.toString)
    if (dirs.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true")
      .parquet(dirs: _*))
  }

  /** Translate a DATA predicate into a STATS predicate over
    * `min_<c>`/`max_<c>` columns — the Delta/Iceberg skipping rule: a
    * file can be skipped only when the stats predicate is definitely
    * false for its whole [min, max] range. Untranslatable subtrees
    * (IS NULL, UDFs, columns without stats) return None = "cannot
    * prune here"; inside an AND the other side may still prune, inside
    * an OR both sides must translate (else the OR can't prune at all).
    */
  private def statsPredicate(e: org.apache.spark.sql.catalyst.expressions.Expression,
      covered: Set[String], bloomCovered: Set[String] = Set.empty,
      toPhys: String => String = identity)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    // predicates speak LOGICAL names; sidecars key on PHYSICAL ones
    // (stats ride the staged files) — translate at the attribute
    def attName(x: Expression): Option[String] = x match {
      case a: UnresolvedAttribute => Some(toPhys(a.name))
      case a: AttributeReference => Some(toPhys(a.name))
      case _ => None
    }
    def name(x: Expression): Option[String] =
      attName(x).filter(covered.contains)
    def value(x: Expression): Option[Any] = x match {
      case Literal(v, dt) =>
        Some(CatalystTypeConverters.convertToScala(v, dt))
      case _ => None
    }
    // bloom probing is sound only for types whose driver-side
    // toString is byte-identical to Spark's cast-to-string (the hash
    // input on the stats pass) — integers, strings, booleans; floats
    // format differently at the edges and are never bloom-probed
    def bloomSafe(v: Any): Boolean = v match {
      case _: String | _: Long | _: java.lang.Long | _: Int |
           _: java.lang.Integer | _: Short | _: Byte | _: Boolean => true
      case _ => false
    }
    // equality can consult BOTH sidecars: the [min,max] containment
    // AND the bloom membership (all k positions present) — a file must
    // pass every test it has stats for
    def eqCond(c0: Option[String], v0: Option[Any])
        : Option[org.apache.spark.sql.Column] =
      for { c <- c0; v <- v0
            cond <- {
              val mm =
                if (covered.contains(c))
                  Some(col(s"min_$c") <= v && col(s"max_$c") >= v)
                else None
              val bl =
                if (bloomCovered.contains(c) && bloomSafe(v))
                  Some(bloomPositions(v)
                    .map(p => array_contains(col(s"bloom_$c"), p))
                    .reduce(_ && _))
                else None
              (mm, bl) match {
                case (Some(a), Some(b)) => Some(a && b)
                case (a, b) => a.orElse(b)
              }
            } } yield cond
    def range(c: String, v: Any, lowOp: (org.apache.spark.sql.Column, Any)
        => org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      lowOp(col(s"min_$c"), v)
    e match {
      case And(l, r) =>
        (statsPredicate(l, covered, bloomCovered, toPhys),
            statsPredicate(r, covered, bloomCovered, toPhys)) match {
          case (Some(a), Some(b)) => Some(a && b)
          case (a, b) => a.orElse(b)
        }
      case Or(l, r) =>
        for { a <- statsPredicate(l, covered, bloomCovered, toPhys)
              b <- statsPredicate(r, covered, bloomCovered, toPhys) } yield a || b
      case EqualTo(a, b) =>
        eqCond(attName(a), value(b)).orElse(eqCond(attName(b), value(a)))
      case LessThan(a, b) =>
        name(a).flatMap(c => value(b).map(v => range(c, v, _ < _)))
          .orElse(name(b).flatMap(c => value(a).map(v =>
            col(s"max_$c") > v)))
      case LessThanOrEqual(a, b) =>
        name(a).flatMap(c => value(b).map(v => range(c, v, _ <= _)))
          .orElse(name(b).flatMap(c => value(a).map(v =>
            col(s"max_$c") >= v)))
      case GreaterThan(a, b) =>
        name(a).flatMap(c => value(b).map(v => col(s"max_$c") > v))
          .orElse(name(b).flatMap(c => value(a).map(v =>
            col(s"min_$c") < v)))
      case GreaterThanOrEqual(a, b) =>
        name(a).flatMap(c => value(b).map(v => col(s"max_$c") >= v))
          .orElse(name(b).flatMap(c => value(a).map(v =>
            col(s"min_$c") <= v)))
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        attName(a).flatMap { c =>
          val conds = vs.map(v => eqCond(Some(c), value(v)))
          if (conds.forall(_.isDefined)) Some(conds.flatten.reduce(_ || _))
          else None
        }
      case _ => None
    }
  }

  /** Live files as of `version` partitioned into (kept, skipped) for
    * `pred`: a file is skipped only when its stats PROVE no row can
    * match (stats predicate false; NULL stats — all-null column,
    * missing sidecar, uncovered column — always keep). The file list
    * rides the driver exactly as in [[liveFilesFast]]; the stats scan
    * is distributed.
    */
  def pruneFiles(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column,
      version: Option[Int] = None): (Seq[String], Seq[String]) = {
    val live = liveFilesFast(spark, dir, version)
    if (live.isEmpty) return (live, Seq.empty)
    // resolve the predicate against the table schema (inserts the
    // implicit casts, binds attributes) and walk the ANALYZED tree
    // — matching the unanalyzed ColumnNode surface would miss
    // every operator Spark rewrites during analysis
    val snap = snapshot(spark, dir, version)
    val cond = snap.filter(pred).queryExecution.analyzed match {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        Some(f.condition)
      case _ => None
    }
    val m = mappingAt(dir, version.getOrElse(Int.MaxValue))
    // skippable ⇔ stats exist AND the stats predicate is definitely
    // false (NULL = unknown = keep)
    def skippedBy(st: DataFrame): Set[String] = {
      val covered = st.columns.filter(_.startsWith("min_"))
        .map(_.stripPrefix("min_")).toSet
      val bloomCovered = st.columns.filter(_.startsWith("bloom_"))
        .map(_.stripPrefix("bloom_")).toSet
      cond.flatMap(
        statsPredicate(_, covered, bloomCovered, m.physicalOf)) match {
        case None => Set.empty
        case Some(sp) => st.filter(!coalesce(sp, lit(true)))
          .select(col("file")).collect().map(_.getString(0)).toSet
      }
    }
    // two independent stats sources feed the SAME skipping rule:
    // the per-file min/max sidecars, and the PATH partition values
    // (a partition value is a min==max stat that costs zero I/O —
    // it was parsed off the live-file list the snapshot needs anyway)
    val skippable =
      statsTable(spark, dir).map(skippedBy).getOrElse(Set.empty) ++
        partitionStats(spark, snap.schema, m, live)
          .map(skippedBy).getOrElse(Set.empty)
    // match on the 2-segment suffix: sidecars always key on
    // it, and a clone's live names are ABSOLUTE source paths
    (live.filterNot(f => skippable.contains(relSuffix(f))),
      live.filter(f => skippable.contains(relSuffix(f))))
  }

  /** Types whose hive path string round-trips EXACTLY through
    * cast-to-string-and-back — the soundness requirement for treating
    * a parsed path value as a file-skipping stat (floats/timestamps
    * can format differently than they re-parse; never prune on them).
    */
  private def exactPathRoundTrip(dt: org.apache.spark.sql.types.DataType)
      : Boolean = dt match {
    case StringType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.BooleanType |
         org.apache.spark.sql.types.DateType => true
    case _ => false
  }

  /** The PATH partition values of `live` files as a synthetic stats
    * table (`file`, `min_c`, `max_c` with min == max == the value,
    * typed per the table schema) — so partition pruning reuses the
    * exact min/max translation and three-valued-logic rules of
    * [[statsPredicate]] instead of a second pruning engine. Columns
    * are restricted to [[exactPathRoundTrip]] types; files without a
    * value for a column carry NULL stats there (= never skipped by
    * it). None when no live file carries partition values at all.
    */
  private def partitionStats(spark: SparkSession,
      logicalSchema: StructType, m: ColumnMapping,
      live: Seq[String]): Option[DataFrame] = {
    val pvals = live.map(f => f -> partitionValuesOf(f))
    if (!pvals.exists(_._2.nonEmpty)) return None
    // physical path names -> (physical, logical type), exact types only
    val typed = pvals.flatMap(_._2.keys).distinct.flatMap { p =>
      val lname = m.logicalOf(p).getOrElse(p)
      logicalSchema.fields.find(_.name == lname)
        .filter(f => exactPathRoundTrip(f.dataType))
        .map(f => p -> f.dataType)
    }
    if (typed.isEmpty) return None
    val rows = pvals.map { case (f, vs) =>
      Row.fromSeq(relSuffix(f) +:
        typed.map { case (p, _) => vs.get(p).flatten.orNull })
    }.asJava
    val raw = spark.createDataFrame(rows, StructType(
      StructField("file", StringType) +:
        typed.map { case (p, _) => StructField(s"__raw_$p", StringType) }))
    Some(raw.select((col("file") +: typed.flatMap { case (p, dt) =>
      Seq(col(s"__raw_$p").cast(dt).as(s"min_$p"),
        col(s"__raw_$p").cast(dt).as(s"max_$p"))
    }): _*))
  }

  /** Live files whose PATH partition values PROVE every row matches
    * `pred` — the lift from row truth to file truth that makes a
    * whole-partition DELETE metadata-only: the predicate must
    * reference ONLY columns that are partition values of the file
    * (constant within it, exact-round-trip typed), and must evaluate
    * TRUE on them. Evaluation is delegated to Catalyst itself over a
    * one-row-per-file local relation, so every operator the predicate
    * may use behaves exactly as it would on the data.
    */
  private def whollyMatchingFiles(spark: SparkSession, dir: String,
      files: Seq[String], pred: org.apache.spark.sql.Column,
      m: ColumnMapping, version: Option[Int] = None): Seq[String] = {
    if (files.isEmpty) return Seq.empty
    val pvals = files.map(f => f -> partitionValuesOf(f))
    if (!pvals.exists(_._2.nonEmpty)) return Seq.empty
    try {
      val snap = snapshot(spark, dir, version)
      val cond = snap.filter(pred).queryExecution.analyzed match {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
        case _ => return Seq.empty
      }
      if (!cond.deterministic) return Seq.empty
      val refs = cond.references.map(_.name).toSeq.distinct // logical
      if (refs.isEmpty) return Seq.empty
      val typed = refs.map { l =>
        val f = snap.schema.fields.find(_.name == l)
          .getOrElse(return Seq.empty)
        if (!exactPathRoundTrip(f.dataType)) return Seq.empty
        (l, m.physicalOf(l), f.dataType)
      }
      // only files carrying a value for EVERY referenced column
      val cands = pvals.filter { case (_, vs) =>
        typed.forall { case (_, p, _) => vs.contains(p) } }
      if (cands.isEmpty) return Seq.empty
      val rows = cands.map { case (f, vs) =>
        Row.fromSeq(f +: typed.map { case (_, p, _) => vs(p).orNull })
      }.asJava
      val raw = spark.createDataFrame(rows, StructType(
        StructField("__file", StringType) +:
          typed.map { case (l, _, _) => StructField(s"__raw_$l", StringType) }))
      val evalDf = typed.foldLeft(raw) { case (acc, (l, _, dt)) =>
        acc.withColumn(l, col(s"__raw_$l").cast(dt)) }
      evalDf.filter(coalesce(pred, lit(false)))
        .select(col("__file")).collect().map(_.getString(0)).toSeq
    } catch { case _: org.apache.spark.sql.AnalysisException => Seq.empty }
  }

  /** Predicate snapshot read WITH file skipping: scan only the files
    * whose per-file stats admit a match, then apply the full predicate
    * — at 100 TB a selective predicate over a clustered column reads
    * the handful of files whose [min,max] intersects it, not the
    * table. Result is always identical to `snapshot(...).filter(pred)`
    * (skipping is sound by the min/max containment rule; pinned in
    * TxTableSpec).
    */
  def snapshotWhere(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column,
      version: Option[Int] = None,
      mergeSchema: Boolean = false): DataFrame = {
    val (kept, _) = pruneFiles(spark, dir, pred, version)
    if (kept.isEmpty) snapshot(spark, dir, version, mergeSchema).limit(0)
    else readApplyingDv(spark, dir, kept,
        dvRefsAt(dir, version.getOrElse(Int.MaxValue)), mergeSchema,
        mappingAt(dir, version.getOrElse(Int.MaxValue)))
      .filter(pred)
  }

  // ---------------------------------------------------------------
  // Change data feed
  // ---------------------------------------------------------------

  /** Change data feed: the NET row-level changes per commit in
    * (`fromVersion`, `toVersion`], as table rows plus `_change_type`
    * ('insert' | 'delete') and `_commit_version` — the public CDF
    * contract (Delta's `table_changes`) derived purely from the log:
    *
    *  - an append's added files ARE its inserts — no diff needed;
    *  - a rewrite commit (DELETE/MERGE) is diffed file-locally:
    *    `removes exceptAll adds` are the rows that stopped being live,
    *    `adds exceptAll removes` the rows that started — survivor rows
    *    that merely re-landed in a new file cancel out, so the feed
    *    carries NET change, not rewrite churn;
    *  - `dataChange=false` commits (OPTIMIZE) are skipped outright —
    *    without the flag a compaction would force diffing the whole
    *    table just to prove the diff is empty.
    *
    * Scale: each version's diff reads ONLY that commit's added/removed
    * files, so feed cost rides the changed data, never table size —
    * the property that makes CDF-driven incremental consumers cheaper
    * than re-scanning snapshots.
    */
  def changes(spark: SparkSession, dir: String, fromVersion: Int,
      toVersion: Option[Int] = None): DataFrame = {
    val upTo = toVersion.getOrElse(currentVersion(dir))
    // the feed speaks the names in force at the END of the window —
    // physical schemas are era-stable, so one mapping serves all
    // versions read here
    val mUp = mappingAt(dir, upTo)
    // visible rows of `fs` under DV refs `dvs` (plain scan when none)
    def vis(fs: Seq[String], dvs: Seq[String]): DataFrame =
      readApplyingDv(spark, dir, fs, dvs, mapping = mUp)
    // align two sides on the column SUPERSET (absent side typed NULL)
    // so rows differing only in a schema-evolved column cannot cancel
    // in the exceptAll, then emit the net insert/delete diff
    def diff(a0: DataFrame, r0: DataFrame): (DataFrame, DataFrame) = {
      val allCols =
        (a0.columns ++ r0.columns.filterNot(a0.columns.contains)).toSeq
      val colType = (a0.schema.fields ++ r0.schema.fields)
        .map(f => f.name -> f.dataType).toMap
      def widen(df: DataFrame): DataFrame =
        df.select(allCols.map(c =>
          if (df.columns.contains(c)) col(c)
          else lit(null).cast(colType(c)).as(c)): _*)
      val a = widen(a0)
      val r = widen(r0)
      (a.exceptAll(r), r.exceptAll(a))
    }
    // replay from v1 to carry the DV state into the feed window; the
    // pre-window entries cost JSON reads only (no data is scanned)
    var dvState = Vector.empty[String]
    val perVersion = readEntries(dir, upTo = upTo).flatMap { e =>
      val preDvs = dvState
      if (e.dvReset) dvState = Vector.empty
      dvState = dvState ++ e.dvs
      if (e.version <= fromVersion || !e.dataChange) Seq.empty
      else {
        def tag(df: DataFrame, ct: String): DataFrame =
          df.withColumn("_change_type", lit(ct))
            .withColumn("_commit_version", lit(e.version.toLong))
        if (e.dvReset) {
          // RESTORE: the one commit whose net effect cannot be read
          // off its own files (it changes liveness via the file set
          // AND the DV state at once) — diff the two adjacent visible
          // snapshots. Restore is rare and explicitly audit-worthy;
          // this is the one full-table term in the feed, same trade
          // Delta documents for CDF-over-RESTORE
          val before = vis(liveFiles(dir, Some(e.version - 1)), preDvs)
          val after = vis(liveFiles(dir, Some(e.version)), dvState)
          val (ins, del) = diff(after, before)
          Seq(tag(ins, "insert"), tag(del, "delete"))
        } else if (e.dvs.nonEmpty && e.adds.isEmpty && e.removes.isEmpty) {
          // merge-on-read DELETE: this commit's deleted rows ARE the
          // new DV's positions — read only the files it references
          val dv = readDv(spark, dir, e.dvs)
          val affectedSuffix = dv.select(col("file")).distinct()
            .collect().map(_.getString(0)).toSet
          val fs = liveFiles(dir, Some(e.version))
            .filter(f => affectedSuffix.contains(relSuffix(f)))
          if (fs.isEmpty) Seq.empty
          else {
            // deletes are the rows visible BEFORE this commit (prior
            // DVs applied) that the new DV hides: two concurrent DV
            // deletes may legally record the SAME (file, pos) — both
            // scanned visibility before the other landed — and a raw
            // read here would emit that row as a delete at BOTH
            // versions, over-retracting in any signed consumer
            val preVis = visibleWithMeta(spark, dir, fs, preDvs, mUp)
            val rows = preVis.join(
                dv.select(col("file").as("_f"), col("pos").as("_pos")),
                Seq("_f", "_pos"), "left_semi")
              .drop("_f", "_pos")
            Seq(tag(rows, "delete"))
          }
        } else (e.adds.nonEmpty, e.removes.nonEmpty) match {
          // adds are read under the commit's OWN dvs: an ordinary
          // append carries none, but a shallow CLONE's first entry
          // adds the source's files together with its inherited DV
          // refs — rows the source had deleted must not surface as
          // inserts. Removes are read under the PRE-commit DV state
          // so rows a DV already hid are not re-reported as deletes
          case (true, false) => Seq(tag(vis(e.adds, e.dvs), "insert"))
          case (false, true) => Seq(tag(vis(e.removes, preDvs), "delete"))
          case (true, true) =>
            val (ins, del) =
              diff(vis(e.adds, e.dvs), vis(e.removes, preDvs))
            Seq(tag(ins, "insert"), tag(del, "delete"))
          case _ => Seq.empty
        }
      }
    }
    if (perVersion.isEmpty)
      snapshot(spark, dir).limit(0)
        .withColumn("_change_type", lit(""))
        .withColumn("_commit_version", lit(0L))
    else
      // across versions schemas may have evolved — union by name,
      // missing columns NULL (the mergeSchema reading of the feed)
      perVersion.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** [[changes]] with delete+insert pairs on the same `keyCol` within
    * one commit reclassified as 'update_preimage' / 'update_postimage'
    * — Delta CDF's four-type surface for keyed tables (a MERGE update
    * is then distinguishable from a delete plus an unrelated insert).
    * One window over the FEED (rides |changes|, never table size).
    */
  def changesWithUpdates(spark: SparkSession, dir: String,
      fromVersion: Int, toVersion: Option[Int] = None,
      keyCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cdf = changes(spark, dir, fromVersion, toVersion)
    val w = Window.partitionBy(col("_commit_version"), col(keyCol))
    cdf
      .withColumn("_has_ins",
        max(when(col("_change_type") === "insert", 1).otherwise(0)).over(w))
      .withColumn("_has_del",
        max(when(col("_change_type") === "delete", 1).otherwise(0)).over(w))
      .withColumn("_change_type",
        when(col("_has_ins") === 1 && col("_has_del") === 1,
          when(col("_change_type") === "delete", "update_preimage")
            .otherwise("update_postimage"))
          .otherwise(col("_change_type")))
      .drop("_has_ins", "_has_del")
  }

  /** Snapshot read as of `version` (None = latest): scan exactly the
    * live file list, resolved through the newest usable checkpoint,
    * minus any rows a deletion vector holds. Without DVs this is a
    * plain multi-file scan, byte-identical to the pre-DV plan.
    */
  def snapshot(spark: SparkSession, dir: String,
      version: Option[Int] = None,
      mergeSchema: Boolean = false): DataFrame = {
    val files = liveFilesFast(spark, dir, version)
    require(files.nonEmpty, s"no live files at version $version")
    val upTo = version.getOrElse(Int.MaxValue)
    readApplyingDv(spark, dir, files, dvRefsAt(dir, upTo), mergeSchema,
      mappingAt(dir, upTo))
  }
}
