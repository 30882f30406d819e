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
    val files = TxTable.liveFilesFast(spark, root, version)
    if (files.isEmpty) throw new NoSuchTableException(Seq(root))
    ParquetTable(s"txlog $root", spark, tableOptions,
      files.map(f => s"$root/data/$f"), None,
      classOf[ParquetFileFormat])
  }

  override def loadTable(ident: Identifier): Table = {
    val root = rootFor(ident)
    if (TxTable.currentVersion(root) == 0)
      throw new NoSuchTableException(ident)
    parquetTable(root, None)
  }

  /** `VERSION AS OF v` — Spark's time-travel resolution hook. */
  override def loadTable(ident: Identifier, version: String): Table =
    parquetTable(rootFor(ident), Some(version.trim.toInt))

  override def tableExists(ident: Identifier): Boolean =
    TxTable.currentVersion(rootFor(ident)) > 0

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
