package graft.engine

import org.apache.spark.sql.SparkSession

/** One place for engine session config so Verify / Bench / tests agree.
  *
  * Scale notes: shuffle partitions default to the local core count (the
  * driver harness runs local[N]); on a real cluster this would be unset
  * and left to AQE coalescing (`spark.sql.adaptive.enabled` stays on —
  * it also handles skew joins and runtime broadcast demotion).
  */
object Sessions {
  def local(appName: String, cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      // SQL surface for transaction-log tables: SELECT ... FROM
      // txlog.`/table/root` [VERSION AS OF v]
      .config("spark.sql.catalog.txlog", "graft.sources.TxLogCatalog")
      // writeStream.format("txlog") routes to the V1 sink (one atomic
      // commit per micro-batch with a SetTransaction watermark); batch
      // READS of the format keep the V2 parquet table
      .config("spark.sql.streaming.disabledV2Writers",
        "graft.sources.TxLogDataSource")
      // events.parquet carries TIMESTAMP(NANOS) — read as long, then
      // Tables normalizes to TimestampType (µs)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // static conf, default 100: a session running hundreds of
      // DISTINCT queries (the inventory, a multi-tenant endpoint)
      // evicts every generated class between visits and pays full
      // Janino recompilation per query per pass — measured as a
      // steady ~1.7× on sub-second queries once the round-11 bench
      // moved to pass-major iteration order. 4096 keeps every plan's
      // codegen hot (entries are compiled classes, tens of KB each)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
