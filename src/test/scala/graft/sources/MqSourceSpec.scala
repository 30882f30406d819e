package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Micro-batch semantics of the graftmq source: size-axis admission
  * control (reference size_limit), complete delivery, ack-on-commit
  * (at-least-once upgrade of reference amqp.py:116-118).
  */
class MqSourceSpec extends SparkSpec {

  private def runAvailableNow(exchange: String, maxPerTrigger: Int,
      sizes: ConcurrentLinkedQueue[Long]): Unit = {
    val q = spark.readStream
      .format("graftmq")
      .option("exchange", exchange)
      .option("maxMessagesPerTrigger", maxPerTrigger.toString)
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sizes.add(batch.count()); ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mq-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
  }

  test("size-axis admission control caps every micro-batch at size_limit") {
    val ex = "ex_size"
    (1 to 12).foreach(i => MemoryBroker.publish(ex, s"""{"i":$i}"""))
    val sizes = new ConcurrentLinkedQueue[Long]()
    runAvailableNow(ex, 5, sizes)
    import scala.jdk.CollectionConverters._
    val s = sizes.asScala.toSeq.filter(_ > 0)
    assert(s.sum == 12, s"all messages delivered once: $s")
    assert(s.forall(_ <= 5), s"no batch exceeds size_limit: $s")
    assert(s.count(_ == 5) == 2, s"full batches flush at the cap: $s")
  }

  test("commit acks the broker log (truncation after durable batch)") {
    val ex = "ex_ack"
    (1 to 7).foreach(i => MemoryBroker.publish(ex, s"""{"i":$i}"""))
    assert(MemoryBroker.exchange(ex).latest == 7L)
    // continuous trigger: the engine acks batch N while constructing
    // batch N+1, so truncation is observable shortly after the drain
    val q = spark.readStream
      .format("graftmq").option("exchange", ex).load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mq-ckpt").toString)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      // Spark acks batch N while constructing batch N+1
      // (MicroBatchExecution.cleanUpLastExecutedMicroBatch), so publish a
      // follow-up message to force construction of the next batch.
      Thread.sleep(1000)
      MemoryBroker.publish(ex, """{"i":8}""")
      val deadline = System.currentTimeMillis() + 30000
      while (MemoryBroker.exchange(ex).committed < 7L &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(MemoryBroker.exchange(ex).committed >= 7L)
      assert(MemoryBroker.exchange(ex).slice(0, 7).isEmpty)
    } finally q.stop()
  }

  test("schema carries value/exchange/content_type/offset/ts and demux column") {
    val ex = "ex_schema"
    MemoryBroker.publish(ex, """{"a":1}""")
    MemoryBroker.publish(ex, "plain body", contentType = "text/plain")
    val got = new ConcurrentLinkedQueue[String]()
    val q = spark.readStream.format("graftmq").option("exchange", ex).load()
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach(r => got.add(
          s"${r.getAs[String]("exchange")}|${r.getAs[Long]("offset")}|" +
            s"${r.getAs[String]("content_type")}|${r.getAs[String]("value")}"))
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mq-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSeq.sorted == Seq(
      s"""$ex|0|application/json|{"a":1}""",
      s"$ex|1|text/plain|plain body"))
  }
}
