package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.TxTable

/** `writeStream.format("txlog")` — the native streaming sink: one
  * atomic commit per micro-batch with a SetTransaction watermark, so
  * replays no-op even after the checkpoint is wiped, and external
  * writers can interleave without breaking exactly-once.
  */
class TxLogSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def drain(in: String, table: String, ckpt: String): Unit = {
    val schema = spark.read.parquet(in).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .writeStream.format("txlog")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(table)
    q.awaitTermination()
  }

  private def rmr(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) return
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => { java.nio.file.Files.deleteIfExists(f); () })
  }

  test("one commit per micro-batch; wiped-checkpoint replay no-ops; external writers interleave safely") {
    val in = tmp("txsink-in-")
    val table = tmp("txsink-tbl-")
    val ckpt = tmp("txsink-ckpt-") + "/c1"
    (1L to 20L).map(i => (i, s"s$i")).toDF("id", "s")
      .repartitionByRange(2, col("id"))
      .write.mode("overwrite").parquet(in)
    drain(in, table, ckpt)
    def ids() = TxTable.snapshot(spark, table)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids() == (1L to 20L).toSet)
    // maxFilesPerTrigger=1 over 2 files → 2 batches → 2 commits
    assert(TxTable.currentVersion(table) == 2)
    assert(TxTable.lastTxn(table,
      TxTable.txnsAt(table).keys.head).contains(1L))
    // the restart-replay shape, hardened: wipe the CHECKPOINT
    // entirely and re-run at the same location — every batch
    // re-delivers from scratch, every one must no-op on the watermark
    rmr(ckpt)
    drain(in, table, ckpt)
    assert(ids() == (1L to 20L).toSet,
      "replayed batches must not double-append")
    assert(TxTable.currentVersion(table) == 2,
      "a replayed batch must not even commit a version")
    // an EXTERNAL writer interleaves — version numbers shift, the
    // per-app watermark does not (the foreachBatch version-number
    // protocol would silently drop the next batch here)
    TxTable.commitAppend(Seq((100L, "x")).toDF("id", "s"), table) // v3
    (21L to 25L).map(i => (i, s"s$i")).toDF("id", "s").coalesce(1)
      .write.mode("append").parquet(in)
    drain(in, table, ckpt) // wiped ckpt was rebuilt: batch 2 is new
    assert(ids() == (1L to 25L).toSet + 100L,
      s"new data must land beside the external append: ${ids()}")
    // CHECK constraints gate the streaming path too
    TxTable.addCheckConstraint(spark, table, "id_pos", "id > 0")
    Seq((-1L, "bad")).toDF("id", "s").coalesce(1)
      .write.mode("append").parquet(in)
    val ex = intercept[Exception] { drain(in, table, ckpt) }
    assert(exCause(ex).exists(
        _.isInstanceOf[TxTable.ConstraintViolationException]),
      s"constraint violation must abort the stream: $ex")
    assert(!ids().contains(-1L))
    ()
  }

  private def exCause(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq

  test("writeStream.partitionBy lands hive-partitioned commits") {
    val in = tmp("txsink-pin-")
    val table = tmp("txsink-ptbl-")
    val ckpt = tmp("txsink-pckpt-") + "/c1"
    Seq((1L, "en"), (2L, "de"), (3L, "en"), (4L, "fr"))
      .toDF("id", "lang")
      .repartitionByRange(2, col("id"))
      .write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .writeStream.format("txlog")
      .partitionBy("lang")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(table)
    q.awaitTermination()
    // every committed file carries its partition segment; pruning
    // works on the streamed table with zero stats sidecars
    val files = TxTable.liveFiles(table)
    assert(files.nonEmpty && files.forall(_.contains("/__p_lang=")))
    val (kept, skipped) = TxTable.pruneFiles(spark, table,
      col("lang") === "de")
    assert(kept.forall(_.contains("=de")) && skipped.nonEmpty)
    assert(TxTable.snapshot(spark, table).count() == 4L)
    ()
  }
}
