package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.catalog.TableProvider
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 surface for [[graft.operators.TxTable]]: SQL-only
  * users read transaction-log tables as `format("txlog")` (or
  * `SELECT ... FROM txlog.`/table/root``), with time travel via the
  * `versionAsOf` option — the extension-parity principle applied to
  * the lakehouse layer: every capability reachable from the Scala API
  * must be reachable from SQL.
  *
  * The READ implementation is deliberately thin: the commit log
  * resolves to a live file list (checkpoint-accelerated), and those
  * files become the paths of a stock [[ParquetTable]] — so column
  * pruning, filter pushdown, vectorized reads, and `mergeSchema`
  * evolution are the battle-tested parquet V2 paths, not
  * re-implementations. The only txlog-specific work is WHICH files to
  * scan, exactly the division of labor in the underlying operator.
  *
  * Deliberately a plain [[TableProvider]], NOT a `FileDataSourceV2`:
  * the V1 `DataSource` machinery unconditionally swaps a file-based
  * V2 provider for its fallback `FileFormat`, which would route
  * `writeStream.format("txlog")` into a bare parquet `FileSink` —
  * data files landing with NO commit entry, invisible to every
  * snapshot. Staying a plain provider keeps [[createSink]] in charge.
  */
class TxLogDataSource extends TableProvider
    with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSinkProvider
    with org.apache.spark.sql.sources.StreamSourceProvider {

  override def shortName(): String = "txlog"

  override def supportsExternalMetadata(): Boolean = true

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p

  private def rootOf(options: CaseInsensitiveStringMap): String = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "txlog expects exactly one table root path (.load(root))"))
    // the commit log is read driver-side via java.nio — strip a
    // file: scheme so a qualified path resolves too
    stripScheme(path)
  }

  private def makeTable(options: CaseInsensitiveStringMap,
      schema: Option[StructType]): Table = {
    val root = rootOf(options)
    val version = Option(options.get("versionAsOf")).map(_.trim.toInt)
    // DV'd / column-mapped tables cannot be served by the raw parquet
    // path — resolve to the snapshot stub; the TxSnapshotScan rule
    // swaps it for the certified snapshot plan at analysis
    val upTo = version.getOrElse(Int.MaxValue)
    if (graft.operators.TxTable.dvRefsAt(root, upTo).nonEmpty ||
        graft.operators.TxTable.mappingAt(root, upTo).active)
      return new SnapshotTxLogTable(root, version)
    val files = graft.operators.TxTable.resolvedScanPaths(
      SparkSession.active, root, version)
    require(files.nonEmpty,
      s"txlog table at $root has no live files" +
        version.map(v => s" at version $v").getOrElse(""))
    val rest = new java.util.HashMap[String, String](options)
    rest.remove("path")
    val pt = ParquetTable(s"txlog $root", SparkSession.active,
      new CaseInsensitiveStringMap(rest), files, schema,
      classOf[ParquetFileFormat])
    // head loads are WRITABLE (appends route through the commit
    // protocol — TxLogWritableTable); a version-pinned load is a
    // read-only snapshot by definition. Crucially the stock
    // ParquetTable must NEVER surface bare: it advertises
    // BATCH_WRITE, and a df.write.format("txlog") routed into it
    // would land parquet files behind the log's back — invisible to
    // every snapshot and unrecoverable corruption.
    if (version.isEmpty) new TxLogWritableTable(root, pt) else pt
  }

  override def inferSchema(options: CaseInsensitiveStringMap)
      : StructType = makeTable(options, None).schema()

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    makeTable(new CaseInsensitiveStringMap(properties), Some(schema))

  /** `writeStream.format("txlog")` — the native streaming sink: each
    * micro-batch lands as ONE atomic commit carrying a
    * `(txnApp, txnVer)` transaction record (Delta's SetTransaction),
    * so a replayed batch — stream restart, or even a checkpoint wiped
    * and rebuilt at the same location — finds its watermark already
    * recorded and no-ops. Unlike the foreachBatch version-number
    * protocol (q313), the watermark survives INTERLEAVED writers: an
    * external append between two batches shifts version numbers but
    * not the per-app watermark. The V1 Sink API is deliberate: the
    * micro-batch arrives as a driver-side DataFrame that the commit
    * protocol stages exactly like any other append (Sessions sets
    * `spark.sql.streaming.disabledV2Writers` to route streaming
    * writes here while batch reads keep the V2 parquet table).
    */
  /** `readStream.format("txlog")` — the native streaming SOURCE:
    * initial snapshot then per-commit appends, version numbers as
    * offsets (see [[TxLogAppendSource]] for the non-append-commit
    * contract and options).
    */
  override def sourceSchema(sqlContext: org.apache.spark.sql.SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val root = stripScheme(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "txlog source needs a table root: .load(root)")))
    (shortName(), schema.getOrElse(graft.operators.TxTable
      .snapshot(sqlContext.sparkSession, root, mergeSchema = true)
      .schema))
  }

  override def createSource(sqlContext: org.apache.spark.sql.SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val root = stripScheme(parameters("path"))
    new TxLogAppendSource(sqlContext, root,
      parameters.get("startingVersion").map(_.trim.toInt),
      parameters.get("maxVersionsPerTrigger").map(_.trim.toInt),
      ignoreDeletes =
        parameters.get("ignoreDeletes").exists(_.trim.toBoolean),
      ignoreChanges =
        parameters.get("ignoreChanges").exists(_.trim.toBoolean),
      schema.getOrElse(sourceSchema(sqlContext, None, providerName,
        parameters)._2))
  }

  override def createSink(sqlContext: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "txlog sink needs a table root: .start(path) or option(\"path\", ...)"))
    val root = stripScheme(path)
    // the app identity must survive restarts: the checkpoint location
    // is the one string that names THIS stream across its lifetime
    val appId = parameters.get("txnAppId").orElse(
        parameters.get("checkpointLocation").map { c =>
          "ckpt-" + java.security.MessageDigest.getInstance("MD5")
            .digest(c.getBytes("UTF-8")).map("%02x".format(_)).mkString
        })
      .getOrElse(throw new IllegalArgumentException(
        "txlog sink needs option(\"checkpointLocation\", ...) or an " +
          "explicit option(\"txnAppId\", ...) for exactly-once replay"))
    // writeStream.partitionBy(...) flows through: every micro-batch
    // commit lands hive-partitioned, so the table stays partition-
    // prunable under continuous ingest
    new TxLogSink(root, appId, partitionColumns,
      autoCompactEvery =
        parameters.get("autoCompactEvery").map(_.trim.toInt)
          .getOrElse(0),
      autoCompactSmallBytes =
        parameters.get("autoCompactSmallBytes").map(_.trim.toLong)
          .getOrElse(32L * 1024 * 1024),
      autoCompactTargetBytes =
        parameters.get("autoCompactTargetBytes").map(_.trim.toLong)
          .getOrElse(128L * 1024 * 1024))
  }
}

/** A txlog table the SQL layer can WRITE: reads delegate to the stock
  * parquet table (pushdown, pruning, vectorization untouched); writes
  * — `INSERT INTO txlog.`root`` and `df.write.format("txlog")
  * .mode("append")` — cross back into the driver as one DataFrame via
  * Spark's [[org.apache.spark.sql.connector.write.V1Write]] fallback
  * and land as ONE atomic [[graft.operators.TxTable.commitAppend]]:
  * CHECK constraints, column-mapping guards, optimistic concurrency
  * and the CDF all hold because there is no path around the protocol.
  * INSERT OVERWRITE is rejected loudly (replaceWhere is the atomic
  * overwrite verb, with its input-validation contract). An optional
  * `partitionBy` write option lands the commit hive-partitioned.
  */
private[sources] class TxLogWritableTable(root: String, delegate: Table)
    extends Table
    with org.apache.spark.sql.connector.catalog.SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import org.apache.spark.sql.connector.catalog.TableCapability

  override def name(): String = delegate.name()
  override def schema(): StructType = delegate.schema()
  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] =
    delegate.partitioning()
  override def properties(): java.util.Map[String, String] =
    delegate.properties()
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    delegate.asInstanceOf[org.apache.spark.sql.connector.catalog
      .SupportsRead].newScanBuilder(options)

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
                  "txlog rejects INSERT OVERWRITE: use " +
                    "TxTable.commitReplaceWhere (atomic, validated) " +
                    "or DELETE + INSERT")
                val parts = Option(info.options.get("partitionBy"))
                  .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
                  .getOrElse(Seq.empty)
                graft.operators.TxTable.commitAppend(data, root,
                  partitionBy = parts)
                ()
              }
            }
        }
    }
}

/** One commit per micro-batch; replays skip via the per-app
  * transaction watermark.
  *
  * Auto-compaction (`autoCompactEvery` > 0): every N committed
  * batches the sink runs [[graft.operators.TxTable.commitCompactSmall]]
  * — the OPTIMIZE-less operational mode: steady-state ingest keeps
  * its own file count bounded instead of depending on an external
  * maintenance job. The sweep is `dataChange=false` (feeds skip it),
  * preserves hive layout and stats/skipping, and is BEST-EFFORT: a
  * concurrent writer winning the conflict check skips this sweep —
  * the next trigger's sweep picks the files up. A lost sweep is
  * never a lost batch.
  */
private[sources] class TxLogSink(root: String, appId: String,
    partitionBy: Seq[String] = Nil,
    autoCompactEvery: Int = 0,
    autoCompactSmallBytes: Long = 32L * 1024 * 1024,
    autoCompactTargetBytes: Long = 128L * 1024 * 1024)
    extends org.apache.spark.sql.execution.streaming.Sink {
  import graft.operators.TxTable

  override def addBatch(batchId: Long,
      data: org.apache.spark.sql.DataFrame): Unit = {
    if (TxTable.lastTxn(root, appId).exists(_ >= batchId)) return
    // the V1 sink contract hands a DataFrame bound to the CURRENT
    // micro-batch's incremental execution — re-planning it (df.write)
    // would reject the streaming sources, so rebuild a batch frame
    // from the already-planned RDD (rows copied: unsafe-row reuse)
    val spark = data.sparkSession
    val batchDf = org.apache.spark.sql.graftshim.Bridges
      .internalCreateDataFrame(spark,
        data.queryExecution.toRdd.map(_.copy()), data.schema)
    TxTable.commitAppend(batchDf, root, txn = Some((appId, batchId)),
      partitionBy = partitionBy)
    if (autoCompactEvery > 0 && (batchId + 1) % autoCompactEvery == 0) {
      try {
        TxTable.commitCompactSmall(spark, root, autoCompactSmallBytes,
          autoCompactTargetBytes)
        ()
      } catch {
        case _: TxTable.CommitConflictException => () // next trigger
      }
    }
    ()
  }

  override def toString: String = s"TxLogSink[$root]"
}
