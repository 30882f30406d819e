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

  override def loadTable(ident: Identifier): Table = {
    val raw = rootFor(ident)
    if (raw.endsWith("#history"))
      return historyTable(raw.stripSuffix("#history"))
    if (TxTable.currentVersion(raw) == 0)
      throw new NoSuchTableException(ident)
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
    val raw = rootFor(ident)
    TxTable.currentVersion(
      if (raw.endsWith("#history")) raw.stripSuffix("#history") else raw) > 0
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
      s"txlog catalog is read-only ($op); use TxTable commits")

  override def createTable(ident: Identifier,
      schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table =
    readOnly("createTable")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = readOnly("alterTable")

  override def dropTable(ident: Identifier): Boolean =
    readOnly("dropTable")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly("renameTable")
}
