package graft.operators

import org.apache.spark.sql.functions._

/** Child-JVM writer for the cross-process concurrency stress
  * ([[TxCrossProcessSpec]]): appends `n` single-row commits, runs one
  * mid-stream small-file sweep, then deletes its own `seq % 5 == 0`
  * rows — retrying real conflicts until the delete serializes. The
  * optimistic commit protocol is FILESYSTEM-keyed (CREATE_NEW on the
  * version file), so two of these in separate JVMs exercise exactly
  * the multi-writer story a shared object store sees.
  */
object TxStressWriter {
  def main(args: Array[String]): Unit = {
    val Array(dir, idS, nS) = args
    val id = idS.toInt
    val n = nS.toInt
    val spark = graft.engine.Sessions.local(s"tx-stress-$id", "2")
    import spark.implicits._
    var conflicts = 0
    (0 until n).foreach { seq =>
      TxTable.commitAppend(
        Seq((id, seq.toLong, "x" * 64)).toDF("writer", "seq", "pad"),
        dir)
      if (seq == n / 2) {
        // maintenance racing ingest: a conflicting sweep must ABORT
        // loudly (never corrupt), and that abort is a legal outcome
        try {
          TxTable.commitCompactSmall(spark, dir,
            smallBytes = Long.MaxValue, targetFiles = Some(2))
          ()
        } catch {
          case _: TxTable.CommitConflictException => conflicts += 1
        }
      }
    }
    var deleted = false
    val deadline = System.currentTimeMillis() + 120000
    while (!deleted && System.currentTimeMillis() < deadline) {
      try {
        TxTable.commitDelete(spark, dir,
          col("writer") === id && col("seq") % 5 === 0)
        deleted = true
      } catch {
        // a REAL conflict retries; so does optimistic-attempt
        // exhaustion under heavy interleaving (a starved JVM can lose
        // more races than the in-commit retry budget covers)
        case _: TxTable.CommitConflictException =>
          conflicts += 1
          Thread.sleep(100)
        case e: RuntimeException
            if String.valueOf(e.getMessage).contains("attempts") =>
          conflicts += 1
          Thread.sleep(100)
      }
    }
    // stdout is the parent's assertion surface
    println(s"STRESS-DONE writer=$id conflicts=$conflicts deleted=$deleted")
    spark.stop()
  }
}
