package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Cross-process transport: the graftmq source against a
  * [[BrokerServer]] over TCP instead of the in-JVM [[MemoryBroker]] —
  * the deployment shape of the reference (out-of-process RabbitMQ,
  * amqp.py:40-49). Covers wire round-trip, Spark end-to-end, offset
  * chunking into multiple input partitions, broker-process restart
  * with WAL recovery, and a genuinely separate broker JVM.
  */
class BrokerServerSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix)

  test("client publish/slice/ack round-trips over TCP, payloads intact") {
    val srv = new BrokerServer(0, None)
    try {
      val c = new BrokerClient("localhost", srv.boundPort, "tcp_rt")
      assert(c.publish("""{"a":1}""") == 0L)
      // bodies with newlines, tabs and spaces survive the wire + WAL
      assert(c.publish("line1\nline2\tend with spaces", "text/plain") == 1L)
      assert(c.latest == 2L)
      val msgs = c.slice(0, 10)
      assert(msgs.map(_.offset).toSeq == Seq(0L, 1L))
      assert(msgs(0).contentType == "application/json")
      assert(msgs(1).contentType == "text/plain")
      assert(msgs(1).body == "line1\nline2\tend with spaces")
      c.ack(1)
      assert(c.committed == 1L)
      assert(c.slice(0, 10).map(_.offset).toSeq == Seq(1L))
    } finally srv.stop()
  }

  test("a large admitted range plans multiple input partitions") {
    val ex = "chunk_ex"
    (0 until 250).foreach(i => MemoryBroker.publish(ex, s"""{"i":$i}"""))
    val stream = new MqMicroBatchStream(ex, None, None, rowsPerPartition = 100)
    val parts = stream.planInputPartitions(MqOffset(0), MqOffset(250))
    assert(parts.length == 3)
    val sizes = parts.map(_.asInstanceOf[MqInlinePartition].msgs.length).toSeq
    assert(sizes == Seq(100, 100, 50))
    // offsets are contiguous across chunks
    val offs = parts.flatMap(_.asInstanceOf[MqInlinePartition].msgs.map(_.offset))
    assert(offs.toSeq == (0L until 250L))
  }

  test("streaming query drains a TCP broker end-to-end") {
    val srv = new BrokerServer(0, None)
    try {
      val url = s"tcp://localhost:${srv.boundPort}"
      val c = new BrokerClient("localhost", srv.boundPort, "tcp_stream")
      (1 to 12).foreach(i => c.publish(s"""{"i":$i}"""))
      val got = new ConcurrentLinkedQueue[Long]()
      val q = spark.readStream.format("graftmq")
        .option("exchange", "tcp_stream")
        .option("broker", url)
        .option("maxMessagesPerTrigger", "5")
        .option("rowsPerPartition", "2") // force multi-partition fetches
        .load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach(r => got.add(r.getAs[Long]("offset")))
        }
        .option("checkpointLocation", tmp("tcp-ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSeq.sorted == (0L until 12L))
    } finally srv.stop()
  }

  test("broker-process restart: WAL recovers the un-acked suffix") {
    val wal = tmp("srv-wal")
    val srv1 = new BrokerServer(0, Some(wal))
    val port = srv1.boundPort
    val c1 = new BrokerClient("localhost", port, "srv_restart")
    (0 until 5).foreach(i => c1.publish(s"""{"i":$i}"""))
    c1.ack(2)
    srv1.stop()
    // new server process on the same WAL dir (port may differ — the
    // client reconnects per operation)
    val srv2 = new BrokerServer(0, Some(wal))
    try {
      val c2 = new BrokerClient("localhost", srv2.boundPort, "srv_restart")
      assert(c2.committed == 2L)
      assert(c2.latest == 5L)
      assert(c2.slice(0, 10).map(_.offset).toSeq == Seq(2L, 3L, 4L))
      assert(c2.publish("""{"i":5}""") == 5L) // offsets continue
    } finally srv2.stop()
  }

  test("exactly-once across a broker restart mid-stream") {
    val wal = tmp("eo-wal")
    val table = new ConcurrentLinkedQueue[Long]()
    def drain(port: Int): Unit = {
      val q = spark.readStream.format("graftmq")
        .option("exchange", "eo_tcp")
        .option("broker", s"tcp://localhost:$port")
        .load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach(r => table.add(r.getAs[Long]("offset")))
        }
        .option("checkpointLocation", wal.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    val srv1 = new BrokerServer(0, Some(wal))
    val c1 = new BrokerClient("localhost", srv1.boundPort, "eo_tcp")
    (0 until 6).foreach(i => c1.publish(s"""{"i":$i}"""))
    drain(srv1.boundPort)
    srv1.stop() // broker dies; Spark checkpoint survives
    val srv2 = new BrokerServer(0, Some(wal))
    try {
      val c2 = new BrokerClient("localhost", srv2.boundPort, "eo_tcp")
      (6 until 9).foreach(i => c2.publish(s"""{"i":$i}"""))
      drain(srv2.boundPort)
      import scala.jdk.CollectionConverters._
      // no loss, no dupes, even though the broker restarted and the
      // drained-but-unacked prefix was replayed into the WAL recovery
      assert(table.asScala.toSeq.sorted == (0L until 9L))
    } finally srv2.stop()
  }

  test("declare kwargs pass through; durable=false skips the WAL") {
    val wal = tmp("decl-wal")
    val srv1 = new BrokerServer(0, Some(wal))
    val c1d = new BrokerClient("localhost", srv1.boundPort, "decl_durable")
    val c1t = new BrokerClient("localhost", srv1.boundPort, "decl_transient")
    c1d.declare(Map("exchange_type" -> "fanout"))          // durable default
    c1t.declare(Map("durable" -> "false", "exchange_type" -> "topic"))
    assert(c1d.declared == Map("exchange_type" -> "fanout"))
    assert(c1t.declared ==
      Map("durable" -> "false", "exchange_type" -> "topic"))
    c1d.publish("""{"keep":1}""")
    c1t.publish("""{"gone":1}""")
    // re-declare is idempotent, first kwargs win (reference signal cache)
    c1t.declare(Map("durable" -> "true"))
    assert(c1t.declared("durable") == "false")
    srv1.stop()
    val srv2 = new BrokerServer(0, Some(wal))
    try {
      val c2d = new BrokerClient("localhost", srv2.boundPort, "decl_durable")
      val c2t = new BrokerClient("localhost", srv2.boundPort, "decl_transient")
      assert(c2d.latest == 1L) // durable exchange survived the restart
      assert(c2t.latest == 0L) // transient one did not
    } finally srv2.stop()
  }

  test("broker runs as a separate OS process (own JVM, no Spark)") {
    val scalaLib = new java.io.File("/opt/spark/jars").listFiles()
      .filter(_.getName.startsWith("scala-library")).head.getPath
    val cp = s"target/scala-2.13/classes:$scalaLib"
    val wal = tmp("proc-wal")
    val proc = new ProcessBuilder(
      "java", "-cp", cp, "graft.sources.BrokerServerMain", "0", wal.toString)
      .redirectErrorStream(true).start()
    try {
      val out = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      val ready = out.readLine() // blocks until the child prints READY <port>
      assert(ready != null && ready.startsWith("READY "), s"got: $ready")
      val port = ready.split(" ")(1).toInt
      val c = new BrokerClient("localhost", port, "proc_ex")
      (1 to 4).foreach(i => c.publish(s"""{"i":$i}"""))
      assert(c.latest == 4L)
      val got = new ConcurrentLinkedQueue[String]()
      val q = spark.readStream.format("graftmq")
        .option("exchange", "proc_ex")
        .option("broker", s"tcp://localhost:$port")
        .load()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach(r => got.add(r.getAs[String]("value")))
        }
        .option("checkpointLocation", tmp("proc-ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSeq.sorted ==
        (1 to 4).map(i => s"""{"i":$i}""").sorted)
    } finally proc.destroyForcibly()
  }
}
