package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.TxTable

/** V2 catalog over [[graft.operators.TxTable]] roots, so SQL-only
  * users get snapshots AND native time travel:
  *
  * {{{
  *   SET spark.sql.catalog.txlog = graft.sources.TxLogCatalog
  *   SELECT * FROM txlog.`/tables/docs`
  *   SELECT * FROM txlog.`/tables/docs` VERSION AS OF 3
  * }}}
  *
  * The table identifier IS the table root path (or a name under the
  * catalog's `base` option). `VERSION AS OF` routes through
  * `loadTable(ident, version)` — Spark's own time-travel hook — and
  * resolution is the checkpoint-accelerated log replay; the returned
  * table is a stock [[ParquetTable]] over the live file list, so scans
  * keep vectorized reads, pushdown, and pruning. Read-only by design
  * for DATA: writes go through the operator's commit protocol, never
  * around it — but the MAINTENANCE verbs are exposed as DSv2 stored
  * procedures (Spark 4's ProcedureCatalog), so a SQL-only operator
  * can run the whole upkeep cycle:
  *
  * {{{
  *   CALL txlog.restore('/tables/docs', 3)
  *   CALL txlog.vacuum('/tables/docs', 5)
  *   CALL txlog.purge_dvs('/tables/docs')
  *   CALL txlog.optimize_small('/tables/docs', 134217728)
  *   CALL txlog.checkpoint('/tables/docs')
  * }}}
  */
class TxLogCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var base: Option[String] = None
  private var tableOptions: CaseInsensitiveStringMap =
    CaseInsensitiveStringMap.empty()

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    base = Option(options.get("base"))
    // remaining catalog options (e.g. mergeSchema) flow to every scan
    val rest = new java.util.HashMap[String, String](options)
    rest.remove("base")
    tableOptions = new CaseInsensitiveStringMap(rest)
  }

  override def name(): String = catalogName

  // declares ANSI constraint DDL support — without this the analyzer
  // rejects ALTER TABLE ... ADD/DROP CONSTRAINT before alterTable is
  // ever called (ResolveTableConstraints.validateCatalogForTableChange)
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  /** The table-root path an identifier denotes — public so the DML
    * bridge ([[graft.plans.TxSqlDml]]) can route DELETE/UPDATE/MERGE
    * on a relation loaded from this catalog back into the commit
    * protocol.
    */
  def rootFor(ident: Identifier): String = {
    val local = (ident.namespace() :+ ident.name()).mkString("/")
    base.map(b => s"$b/$local").getOrElse(local)
  }

  private def parquetTable(root: String, version: Option[Int]): Table = {
    val spark = SparkSession.active
    // a table the raw parquet path cannot serve — in-force DVs (the
    // anti-join must apply) or column mapping (files carry physical
    // names) — resolves to the snapshot stub; the TxSnapshotScan
    // resolution rule swaps it for the certified snapshot plan
    val upTo = version.getOrElse(Int.MaxValue)
    if (TxTable.dvRefsAt(root, upTo).nonEmpty ||
        TxTable.mappingAt(root, upTo).active)
      return new SnapshotTxLogTable(root, version)
    val files = TxTable.resolvedScanPaths(spark, root, version)
    if (files.isEmpty) throw new NoSuchTableException(Seq(root))
    val pt = ParquetTable(s"txlog $root", spark, tableOptions,
      files, None,
      classOf[ParquetFileFormat])
    // head loads accept INSERT INTO through the commit protocol;
    // version-pinned loads are read-only snapshots
    if (version.isEmpty) new TxLogWritableTable(root, pt) else pt
  }

  /** DESCRIBE-HISTORY as a SQL relation: the commit log itself,
    * one row per version — driver-sized by construction (the log is
    * bounded by commit count), served as a [[LocalScan]] so no job
    * is launched for an audit query.
    *
    * {{{ SELECT * FROM txlog.`/tables/docs#history` }}}
    */
  private def historyTable(root: String): Table = {
    import org.apache.spark.sql.connector.catalog.{SupportsRead, TableCapability}
    import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
    import org.apache.spark.sql.types.{BooleanType, IntegerType, StructType}
    val hist = TxTable.historyFull(root)
    if (hist.isEmpty) throw new NoSuchTableException(Seq(root))
    val histSchema = new StructType()
      .add("version", IntegerType).add("n_adds", IntegerType)
      .add("n_removes", IntegerType).add("data_change", BooleanType)
    new Table with SupportsRead {
      override def name(): String = s"txlog history $root"
      override def schema(): StructType = histSchema
      override def capabilities(): java.util.Set[org.apache.spark.sql
          .connector.catalog.TableCapability] =
        java.util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(opts: CaseInsensitiveStringMap)
          : ScanBuilder = new ScanBuilder {
        override def build(): Scan = new LocalScan {
          override def readSchema(): StructType = histSchema
          override def rows()
              : Array[org.apache.spark.sql.catalyst.InternalRow] =
            hist.map { case (v, a, r, dc) =>
              org.apache.spark.sql.catalyst.InternalRow(v, a, r, dc)
            }.toArray
        }
      }
    }
  }

  /** The active CHECK registry as a SQL relation (the SHOW-CONSTRAINTS
    * surface a DBA expects next to ADD/DROP CONSTRAINT) — driver-sized
    * like the registry itself, served without a job:
    *
    * {{{ SELECT * FROM txlog.`/tables/docs#constraints` }}}
    */
  private def constraintsTable(root: String): Table = {
    import org.apache.spark.sql.connector.catalog.{SupportsRead, TableCapability}
    import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
    import org.apache.spark.sql.types.{StringType, StructType}
    val cons = TxTable.checkConstraints(root) // empty registry = 0 rows
    val consSchema = new StructType()
      .add("name", StringType).add("expr", StringType)
    new Table with SupportsRead {
      override def name(): String = s"txlog constraints $root"
      override def schema(): StructType = consSchema
      override def capabilities(): java.util.Set[org.apache.spark.sql
          .connector.catalog.TableCapability] =
        java.util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(opts: CaseInsensitiveStringMap)
          : ScanBuilder = new ScanBuilder {
        override def build(): Scan = new LocalScan {
          override def readSchema(): StructType = consSchema
          override def rows()
              : Array[org.apache.spark.sql.catalyst.InternalRow] =
            cons.map { case (n, e) =>
              org.apache.spark.sql.catalyst.InternalRow(
                org.apache.spark.unsafe.types.UTF8String.fromString(n),
                org.apache.spark.unsafe.types.UTF8String.fromString(e))
            }.toArray
        }
      }
    }
  }

  override def loadTable(ident: Identifier): Table = {
    val raw = rootFor(ident)
    if (raw.endsWith("#history"))
      return historyTable(raw.stripSuffix("#history"))
    if (raw.endsWith("#constraints"))
      return constraintsTable(raw.stripSuffix("#constraints"))
    if (TxTable.currentVersion(raw) == 0)
      return markerSchema(raw) // created by DDL, no commits yet
        .map(sch => new EmptyTxLogTable(raw, sch): Table)
        .getOrElse(throw new NoSuchTableException(ident))
    parquetTable(raw, None)
  }

  /** `VERSION AS OF v` — Spark's time-travel resolution hook. */
  override def loadTable(ident: Identifier, version: String): Table =
    parquetTable(rootFor(ident), Some(version.trim.toInt))

  /** `TIMESTAMP AS OF t` — Spark hands MICROseconds since epoch;
    * resolution delegates to the in-commit timestamps
    * ([[graft.operators.TxTable.versionAt]], Delta's greatest-
    * version-at-or-before rule).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootFor(ident)
    parquetTable(root,
      Some(TxTable.versionAt(root, Math.floorDiv(timestamp, 1000L))))
  }

  override def tableExists(ident: Identifier): Boolean = {
    val raw0 = rootFor(ident)
    val raw = raw0.stripSuffix("#history").stripSuffix("#constraints")
    TxTable.currentVersion(raw) > 0 || markerSchema(raw).isDefined
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // roots are paths; there is no namespace to enumerate

  // -----------------------------------------------------------------
  // Stored procedures (maintenance verbs)
  // -----------------------------------------------------------------

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.connector.read.{LocalScan, Scan}
  import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

  /** One single-row result relation — procedures report what they did
    * (the committed version / reclaimed count) as a queryable row.
    */
  private def resultScan(schema: StructType,
      row: InternalRow): java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(row)
    }).iterator()

  private def proc(pname: String, params: Seq[(String, DataType)],
      outName: String)(run: InternalRow => Long): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = s"txlog maintenance: $pname"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = pname
          override def description(): String =
            s"txlog maintenance: $pname"
          override def parameters(): Array[ProcedureParameter] =
            params.map { case (n, t) =>
              ProcedureParameter.in(n, t).build()
            }.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] =
            resultScan(new StructType().add(outName, LongType),
              InternalRow(run(input)))
        }
    }

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    def spark = SparkSession.active
    def path(in: InternalRow) = in.getUTF8String(0).toString
    ident.name() match {
      case "restore" =>
        proc("restore",
          Seq("table" -> StringType, "version" -> IntegerType),
          "version")(in =>
          TxTable.commitRestore(spark, path(in), in.getInt(1)).toLong)
      case "vacuum" =>
        proc("vacuum",
          Seq("table" -> StringType, "retain_from" -> IntegerType),
          "reclaimed")(in =>
          TxTable.vacuum(path(in), in.getInt(1)).size.toLong)
      case "purge_dvs" =>
        proc("purge_dvs", Seq("table" -> StringType), "version")(in =>
          TxTable.commitPurgeDVs(spark, path(in)).toLong)
      case "optimize_small" =>
        proc("optimize_small",
          Seq("table" -> StringType, "small_bytes" -> LongType),
          "version")(in =>
          TxTable.commitCompactSmall(spark, path(in),
            in.getLong(1)).toLong)
      case "checkpoint" =>
        proc("checkpoint", Seq("table" -> StringType), "version")(in =>
          TxTable.checkpoint(spark, path(in)).toLong)
      case other =>
        throw new UnsupportedOperationException(
          s"no such txlog procedure: $other (have restore, vacuum, " +
            "purge_dvs, optimize_small, checkpoint)")
    }
  }

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    Array("restore", "vacuum", "purge_dvs", "optimize_small",
      "checkpoint").map(Identifier.of(namespace, _))

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"txlog catalog does not support $op")

  // -----------------------------------------------------------------
  // DDL: CREATE TABLE / CTAS / DROP TABLE / ALTER TABLE column ops
  // -----------------------------------------------------------------

  /** A created-but-still-empty table's declared schema, persisted as
    * a marker INSIDE the (otherwise empty) log dir so `CREATE TABLE`
    * followed by `INSERT INTO` works across statements and sessions.
    * Once data lands the marker is advisory history: the log and the
    * staged files govern (schema-on-write), exactly like every other
    * txlog table.
    */
  private def schemaMarker(root: String): java.nio.file.Path =
    java.nio.file.Paths.get(root, "_txlog", "_created_schema.json")

  private def markerSchema(root: String)
      : Option[org.apache.spark.sql.types.StructType] =
    if (!java.nio.file.Files.exists(schemaMarker(root))) None
    else Some(org.apache.spark.sql.types.DataType.fromJson(
      new String(java.nio.file.Files.readAllBytes(schemaMarker(root)),
        "UTF-8")).asInstanceOf[org.apache.spark.sql.types.StructType])

  override def createTable(ident: Identifier,
      schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table = {
    val root = rootFor(ident)
    if (TxTable.currentVersion(root) > 0 || markerSchema(root).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "txlog CREATE TABLE takes no PARTITIONED BY clause; pass the " +
        "partitionBy write option on insert (hive layout is a " +
        "per-commit write property here)")
    java.nio.file.Files.createDirectories(
      schemaMarker(root).getParent)
    java.nio.file.Files.write(schemaMarker(root),
      schema.json.getBytes("UTF-8"))
    new EmptyTxLogTable(root, schema)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootFor(ident)
    if (TxTable.currentVersion(root) == 0 && markerSchema(root).isEmpty)
      return false
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(java.nio.file.Files.list(p))(
          _.iterator().asScala.toList).foreach(rm)
      }
      java.nio.file.Files.deleteIfExists(p)
      ()
    }
    rm(java.nio.file.Paths.get(root))
    true
  }

  /** ALTER TABLE column DDL routes into the column-mapping commits:
    * RENAME COLUMN is a metadata-only log entry, DROP COLUMN hides
    * the physical column without rewriting a byte — the SQL spelling
    * of [[TxTable.renameColumn]]/[[TxTable.dropColumn]] (q360) — and
    * ADD COLUMN is a metadata-only commit too ([[TxTable.addColumn]]:
    * reads synthesize typed NULLs until an append materializes the
    * column; schema-on-write appends, certified by q314, remain the
    * implicit path). Other changes are rejected loudly. A mapped
    * table's SQL scans
    * are served from the snapshot plan by the
    * [[graft.plans.TxSnapshotScan]] resolution rule (logical names
    * resolved, DVs applied) — the raw parquet path would serve
    * PHYSICAL names and is never used for such tables.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val root = rootFor(ident)
    val spark = SparkSession.active
    changes.foreach {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "txlog columns are top-level; nested renames unsupported")
        TxTable.renameColumn(spark, root, r.fieldNames.head, r.newName)
        ()
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "txlog columns are top-level; nested drops unsupported")
        TxTable.dropColumn(spark, root, d.fieldNames.head)
        ()
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "txlog columns are top-level; nested adds unsupported")
        require(a.isNullable,
          "txlog ADD COLUMN must be nullable: there is no existing " +
            "data to backfill a NOT NULL column")
        require(a.position() == null,
          "txlog ADD COLUMN appends at the end; FIRST/AFTER " +
            "positioning is unsupported")
        val name = a.fieldNames.head
        if (TxTable.currentVersion(root) == 0) {
          // created-but-empty table: extend the declared-schema marker
          val cur = markerSchema(root).getOrElse(
            throw new NoSuchTableException(Seq(root)))
          require(!cur.fieldNames.exists(_.equalsIgnoreCase(name)),
            s"column $name already exists")
          java.nio.file.Files.write(schemaMarker(root),
            cur.add(name, a.dataType(), nullable = true)
              .json.getBytes("UTF-8"))
          ()
        } else {
          TxTable.addColumn(spark, root, name, a.dataType().sql)
          ()
        }
      // ALTER TABLE ... ADD CONSTRAINT name CHECK (expr) — Spark 4's
      // ANSI constraint DDL routes here as a TableChange; the engine
      // side (registry, staged-first enforcement, CLONE inheritance)
      // predates this spelling, so the catalog only translates.
      // addCheckConstraint re-validates the CURRENT snapshot (Delta's
      // rule), so a constraint existing data violates is rejected
      // regardless of what the analyzer already checked.
      case a: TableChange.AddConstraint =>
        a.constraint() match {
          case c: org.apache.spark.sql.connector.catalog.constraints
              .Check =>
            TxTable.addCheckConstraint(spark, root, c.name(),
              c.predicateSql())
          case other => readOnly(
            s"constraint kind ${other.getClass.getSimpleName} " +
              "(only CHECK is supported)")
        }
      case d: TableChange.DropConstraint =>
        // existence is checked case-insensitively, but the registry
        // drop must use the STORED name — replay removes by exact
        // match, so dropping under the user's casing would report
        // success while the constraint kept enforcing
        val stored = TxTable.checkConstraints(root)
          .collectFirst { case (n, _) if n.equalsIgnoreCase(d.name()) => n }
        if (stored.isEmpty && !d.ifExists())
          throw new IllegalArgumentException(
            s"no such constraint: ${d.name()}")
        stored.foreach(TxTable.dropCheckConstraint(root, _))
      case other => readOnly(s"alterTable change $other")
    }
    new SnapshotTxLogTable(root)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly("renameTable")
}

/** The SQL handle for a txlog table the raw parquet scan cannot
  * serve — active column mapping (files carry PHYSICAL names) or
  * in-force deletion vectors (the anti-join must apply). Resolvable
  * (logical-name schema, so ALTER TABLE and the DML bridge work) and
  * writable at head (appends guard against physical-name shadowing
  * inside the commit protocol). SCANS are served by the
  * [[graft.plans.TxSnapshotScan]] resolution rule, which swaps this
  * relation for the certified snapshot plan (DV anti-join applied,
  * logical names resolved) before a ScanBuilder is ever requested —
  * `newScanBuilder` is only reached when the graft extensions are not
  * registered, and fails with the pointer rather than serving
  * resurrected rows or physical names.
  */
private[graft] class SnapshotTxLogTable(val root: String,
    val pinnedVersion: Option[Int] = None)
    extends Table
    with org.apache.spark.sql.connector.catalog.SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import org.apache.spark.sql.connector.catalog.TableCapability

  override def name(): String = s"txlog $root (snapshot" +
    pinnedVersion.map(v => s" @v$v").getOrElse("") + ")"
  override def schema(): org.apache.spark.sql.types.StructType =
    TxTable.snapshot(SparkSession.active, root, pinnedVersion).schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    throw new IllegalArgumentException(
      s"txlog table at $root has in-force deletion vectors or column " +
        "mapping; the raw parquet scan cannot serve it. Register " +
        "spark.sql.extensions=graft.engine.GraftExtensions (the " +
        "TxSnapshotScan rule serves these scans) or read via " +
        "TxTable.snapshot")

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            new org.apache.spark.sql.sources.InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                  overwrite: Boolean): Unit = {
                if (overwrite) throw new UnsupportedOperationException(
                  "txlog rejects INSERT OVERWRITE")
                if (pinnedVersion.nonEmpty)
                  throw new UnsupportedOperationException(
                    "cannot write to a version-pinned txlog snapshot")
                TxTable.commitAppend(data, root)
                ()
              }
            }
        }
    }
}

/** A table created by DDL that has no commits yet: reads are an empty
  * LocalScan of the declared schema; the first INSERT/CTAS write
  * lands version 1 through the commit protocol and the table becomes
  * an ordinary txlog table.
  */
private[sources] class EmptyTxLogTable(root: String,
    declared: org.apache.spark.sql.types.StructType)
    extends Table
    with org.apache.spark.sql.connector.catalog.SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import org.apache.spark.sql.connector.catalog.TableCapability

  override def name(): String = s"txlog $root (empty)"
  override def schema(): org.apache.spark.sql.types.StructType = declared
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    new org.apache.spark.sql.connector.read.ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.LocalScan {
          override def readSchema()
              : org.apache.spark.sql.types.StructType = declared
          override def rows()
              : Array[org.apache.spark.sql.catalyst.InternalRow] =
            Array.empty
        }
    }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            new org.apache.spark.sql.sources.InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                  overwrite: Boolean): Unit = {
                val parts = Option(info.options.get("partitionBy"))
                  .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
                  .getOrElse(Seq.empty)
                TxTable.commitAppend(data, root, partitionBy = parts)
                ()
              }
            }
        }
    }
}
