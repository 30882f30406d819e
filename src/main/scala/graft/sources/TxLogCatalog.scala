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
  * keep vectorized reads, pushdown, and pruning. Read-only by design:
  * writes go through the operator's commit protocol, never around it.
  */
class TxLogCatalog extends TableCatalog {

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

  private def rootFor(ident: Identifier): String = {
    val local = (ident.namespace() :+ ident.name()).mkString("/")
    base.map(b => s"$b/$local").getOrElse(local)
  }

  private def parquetTable(root: String, version: Option[Int]): Table = {
    val spark = SparkSession.active
    val files = TxTable.resolvedScanPaths(spark, root, version)
    if (files.isEmpty) throw new NoSuchTableException(Seq(root))
    ParquetTable(s"txlog $root", spark, tableOptions,
      files, None,
      classOf[ParquetFileFormat])
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

  override def tableExists(ident: Identifier): Boolean = {
    val raw = rootFor(ident)
    TxTable.currentVersion(
      if (raw.endsWith("#history")) raw.stripSuffix("#history") else raw) > 0
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // roots are paths; there is no namespace to enumerate

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
