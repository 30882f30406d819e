package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetDataSourceV2, ParquetTable}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 surface for [[graft.operators.TxTable]]: SQL-only
  * users read transaction-log tables as `format("txlog")` (or
  * `SELECT ... FROM txlog.`/table/root``), with time travel via the
  * `versionAsOf` option — the extension-parity principle applied to
  * the lakehouse layer: every capability reachable from the Scala API
  * must be reachable from SQL.
  *
  * The implementation is deliberately thin: the commit log resolves to
  * a live file list (checkpoint-accelerated), and those files become
  * the paths of a stock [[ParquetTable]] — so column pruning, filter
  * pushdown, vectorized reads, and `mergeSchema` evolution are the
  * battle-tested parquet V2 paths, not re-implementations. The only
  * txlog-specific work is WHICH files to scan, exactly the division of
  * labor in the underlying operator.
  */
class TxLogDataSource extends ParquetDataSourceV2 {

  override def shortName(): String = "txlog"

  private def resolvedDataPaths(options: CaseInsensitiveStringMap)
      : Seq[String] = {
    val roots = getPaths(options)
    require(roots.size == 1,
      s"txlog expects exactly one table root path, got: $roots")
    // the commit log is read driver-side via java.nio — strip a
    // file: scheme so a qualified path resolves too
    val root =
      if (roots.head.startsWith("file:"))
        new java.net.URI(roots.head).getPath
      else roots.head
    val version = Option(options.get("versionAsOf")).map(_.trim.toInt)
    val files = graft.operators.TxTable.resolvedScanPaths(
      SparkSession.active, root, version)
    require(files.nonEmpty,
      s"txlog table at $root has no live files" +
        version.map(v => s" at version $v").getOrElse(""))
    files
  }

  override def getTable(options: CaseInsensitiveStringMap): Table =
    ParquetTable(s"txlog ${getPaths(options).mkString(",")}",
      sparkSession, getOptionsWithoutPaths(options),
      resolvedDataPaths(options), None, fallbackFileFormat)

  override def getTable(options: CaseInsensitiveStringMap,
      schema: StructType): Table =
    ParquetTable(s"txlog ${getPaths(options).mkString(",")}",
      sparkSession, getOptionsWithoutPaths(options),
      resolvedDataPaths(options), Some(schema), fallbackFileFormat)
}
