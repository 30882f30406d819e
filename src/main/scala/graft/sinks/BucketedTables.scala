package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout for co-located joins (SURVEY §2.2 / the
  * 100 TB playbook): writing both join sides bucketed by the join key
  * into the warehouse lets Spark plan repeated joins on that key with
  * ZERO shuffle — the exchange happens once at write time, every
  * downstream join reads pre-partitioned buckets.
  *
  * Rule of thumb: nBuckets ≈ target parallelism at the joined data
  * size; both sides must agree on (key, nBuckets) for the exchange-free
  * plan to kick in.
  */
object BucketedTables {
  def write(df: DataFrame, table: String, key: String, nBuckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
