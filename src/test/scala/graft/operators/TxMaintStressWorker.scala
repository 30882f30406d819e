package graft.operators

/** Child-JVM MAINTENANCE worker for the cross-process stress
  * ([[TxMaintCrossProcessSpec]]): while DML writers hammer the table
  * from other JVMs, this one loops the upkeep verbs — incremental
  * small-file sweep, explicit checkpoint, concurrent-safe VACUUM —
  * exactly the OPTIMIZE/maintenance surface the round-13 verdict
  * called out as the oracle gate's blind spot. Legal outcomes per
  * iteration: success, or a loud CommitConflictException when a DML
  * commit wins the race (retried next lap). ANY other failure —
  * NoSuchFileException from a reclaimed live temp, a torn checkpoint,
  * a vacuumed in-flight stage — exits nonzero and fails the parent.
  *
  * `sink` role: drives the native streaming txlog sink (SetTransaction
  * watermark + autoCompactEvery) from a pre-built source table into
  * the SAME contended table — steady-state ingest racing DML and
  * maintenance.
  */
object TxMaintStressWorker {
  def main(args: Array[String]): Unit = {
    val role = args(0)
    val dir = args(1)
    val spark = graft.engine.Sessions.local(s"tx-maint-$role", "2")
    role match {
      case "maint" =>
        val laps = args(2).toInt
        var conflicts = 0
        var sweeps = 0
        (0 until laps).foreach { _ =>
          try {
            val pre = TxTable.currentVersion(dir)
            val v = TxTable.commitCompactSmall(spark, dir,
              smallBytes = Long.MaxValue, targetFiles = Some(2))
            if (v > pre) sweeps += 1
          } catch {
            case _: TxTable.CommitConflictException => conflicts += 1
          }
          TxTable.checkpoint(spark, dir)
          // retention-window vacuum CONCURRENT with live writers:
          // reclaims only committed-dead files; in-flight stages and
          // temps are age-protected
          TxTable.vacuum(dir, retainFrom = 1)
          Thread.sleep(50)
        }
        println(s"STRESS-DONE maint sweeps=$sweeps conflicts=$conflicts")
      case "sink" =>
        val src = args(2)
        val ckpt = java.nio.file.Files
          .createTempDirectory("tx-maint-sinkckpt-").toString
        val q = spark.readStream.format("txlog")
          .option("startingVersion", "0")
          .option("maxVersionsPerTrigger", "1").load(src)
          .writeStream.format("txlog")
          .option("autoCompactEvery", "3")
          .option("autoCompactSmallBytes",
            (256L * 1024 * 1024).toString)
          .option("checkpointLocation", ckpt)
          .start(dir)
        q.processAllAvailable()
        q.stop()
        println("STRESS-DONE sink")
      case other =>
        sys.error(s"unknown role $other")
    }
    spark.stop()
  }
}
