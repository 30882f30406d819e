package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** The round-13 verdict's task 1: extend the cross-process stress to
  * the MAINTENANCE verbs. Four JVMs against ONE txlog dir —
  *
  *  - two DML writers ([[TxStressWriter]]: appends, a mid-stream
  *    sweep, rewriting deletes),
  *  - one maintenance worker ([[TxMaintStressWorker]] `maint`:
  *    small-file sweep + explicit checkpoint + concurrent
  *    retention-window VACUUM, in a loop),
  *  - one streaming-sink worker (`sink`: the native txlog sink with
  *    SetTransaction watermark + autoCompactEvery, draining a
  *    pre-built source table into the same contended dir),
  *
  * while THIS process runs a live CDF consumer over the same table.
  * Asserted: serializable gap-free history; the final snapshot equals
  * the closed-form row set (no lost commit, no resurrected row, no
  * lost or doubled sink batch); the streamed CDF replays to exactly
  * the final snapshot; the checkpoint-accelerated file resolution
  * equals the full log replay; and a post-quiesce full vacuum
  * reclaims without changing any answer.
  */
class TxMaintCrossProcessSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
    "java.base/sun.nio.cs", "java.base/sun.security.action",
    "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private val cp = "target/scala-2.13/classes:" +
    "target/scala-2.13/test-classes:/opt/spark/jars/*"

  private def launch(args: Seq[String])
      : (Process, java.lang.StringBuilder) = {
    val cmd = Seq("java", "-cp", cp) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Xmx2g") ++ args
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .start()
    val out = new java.lang.StringBuilder
    val rd = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      var line = r.readLine()
      while (line != null) {
        out.synchronized { out.append(line).append('\n') }
        line = r.readLine()
      }
    })
    rd.setDaemon(true); rd.start()
    (p, out)
  }

  test("maintenance verbs race DML + streaming sink + live CDF consumer: serializable, nothing lost") {
    val spark = TestSession.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tx-maint-")
      .toString
    val n = 8 // appends per DML writer
    // the sink's source table: writer-9 rows in 5 commits
    val src = java.nio.file.Files.createTempDirectory("tx-maint-src-")
      .toString
    val m = 5
    (0 until m).foreach { s =>
      TxTable.commitAppend(
        Seq((9, s.toLong, "s" * 32)).toDF("writer", "seq", "pad"), src)
    }
    // seed the contended table so every racer (and the CDF consumer's
    // schema inference) sees an existing log
    TxTable.commitAppend(
      Seq((0, -1L, "seed")).toDF("writer", "seq", "pad"), dir)

    // live CDF consumer, in-process, running while everything races
    val cdfCkpt = java.nio.file.Files
      .createTempDirectory("tx-maint-cdf-").toString
    val events = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, Int, Long)]())
    val cdf = spark.readStream.format("txlog-cdf").load(dir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select(col("_change_type"), col("writer"), col("seq"))
          .collect().foreach { r =>
            events.add((r.getString(0), r.getInt(1), r.getLong(2)))
            ()
          }
        ()
      }
      .option("checkpointLocation", cdfCkpt).start()

    val (p1, o1) = launch(Seq("graft.operators.TxStressWriter",
      dir, "1", n.toString))
    val (p2, o2) = launch(Seq("graft.operators.TxStressWriter",
      dir, "2", n.toString))
    val (p3, o3) = launch(Seq("graft.operators.TxMaintStressWorker",
      "maint", dir, "12"))
    val (p4, o4) = launch(Seq("graft.operators.TxMaintStressWorker",
      "sink", dir, src))
    val all = Seq((p1, o1, "dml1"), (p2, o2, "dml2"),
      (p3, o3, "maint"), (p4, o4, "sink"))
    all.foreach { case (p, o, name) =>
      assert(p.waitFor(900, java.util.concurrent.TimeUnit.SECONDS),
        s"$name hung:\n$o")
      assert(p.exitValue() == 0, s"$name failed:\n$o")
      assert(o.synchronized(o.toString).contains("STRESS-DONE"),
        s"$name never finished its protocol:\n$o")
    }

    // serializable history: gap-free versions across four processes
    val hist = TxTable.historyFull(dir)
    assert(hist.map(_._1) == (1 to hist.size),
      s"history has gaps or duplicates: ${hist.map(_._1)}")
    // the maintenance worker's sweeps (and the sink's auto-sweeps)
    // land as dataChange=false — the feed-invisible kind
    assert(hist.exists(h => !h._4), "no maintenance commit ever landed")

    // closed form: seed + both DML writers (minus their seq%5 deletes)
    // + the sink's source rows exactly once
    val got = TxTable.snapshot(spark, dir)
      .select(col("writer"), col("seq"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val expected = Set((0, -1L)) ++
      (for { w <- Seq(1, 2); s <- 0 until n if s % 5 != 0 }
        yield (w, s.toLong)).toSet ++
      (0 until m).map(s => (9, s.toLong)).toSet
    assert(got == expected,
      s"extra=${got -- expected} missing=${expected -- got}")

    // the checkpoint fast path must equal the full log replay
    val v = TxTable.currentVersion(dir)
    assert(TxTable.liveFilesFast(spark, dir, Some(v)).toSet ==
      TxTable.liveFiles(dir, Some(v)).toSet,
      "checkpoint-accelerated resolution diverged under stress")

    // drain the CDF to the final version and replay it: net inserts
    // per key must equal the final snapshot exactly
    cdf.processAllAvailable()
    cdf.stop()
    import scala.jdk.CollectionConverters._
    val net = events.asScala.groupBy(e => (e._2, e._3)).map {
      case (k, es) =>
        k -> (es.count(_._1 == "insert") - es.count(_._1 == "delete"))
    }
    assert(net.values.forall(c => c == 0 || c == 1),
      s"CDF replay produced impossible net counts: ${net.filter(e => e._2 != 0 && e._2 != 1)}")
    val replayed = net.filter(_._2 == 1).keySet
    assert(replayed == expected,
      s"CDF replay diverged from the final snapshot: " +
        s"extra=${replayed -- expected} missing=${expected -- replayed}")

    // post-quiesce full reclaim changes no answer
    TxTable.vacuum(dir, retainFrom = v, tempRetainMillis = -1000L)
    val after = TxTable.snapshot(spark, dir)
      .select(col("writer"), col("seq"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(after == expected, "full vacuum changed the snapshot")
    ()
  }
}
