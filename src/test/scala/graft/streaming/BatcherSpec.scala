package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Reference batcher contract (mirrors tests/test_batcher.py):
  * size-triggered flush is immediate; a partial batch flushes when the
  * time limit expires after its first message.
  *
  * Note: processAllAvailable() is unusable with ProcessingTimeTimeout
  * (the stream perpetually self-schedules batches), so assertions poll
  * the memory sink with deadlines.
  */
class BatcherSpec extends SparkSpec {
  private def waitFor(cond: => Boolean, ms: Long = 60000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(200)
    cond
  }

  test("size flush is immediate; remainder flushes on time expiry") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(String, String)]
    val out = Batcher.sizeOrTime(input.toDS(), sizeLimit = 3, timeLimitMs = 2000)
    val q = out.writeStream.format("memory").queryName("batcher_test")
      .outputMode("append").trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      input.addData(("f", "m1"), ("f", "m2"), ("f", "m3"), ("f", "m4"))
      assert(waitFor(spark.table("batcher_test").count() >= 1),
        "size batch never emitted")
      val first = spark.table("batcher_test").collect().head
      assert(first.getAs[scala.collection.Seq[String]]("batch") == scala.collection.Seq("m1", "m2", "m3"))
      assert(first.getAs[String]("reason") == "size")
      // m4 buffered; must flush as a time batch ~2s later
      assert(waitFor(spark.table("batcher_test").count() >= 2),
        "time batch never emitted")
      val time = spark.table("batcher_test").collect()
        .find(_.getAs[String]("reason") == "time").get
      assert(time.getAs[scala.collection.Seq[String]]("batch") == scala.collection.Seq("m4"))
    } finally q.stop()
  }

  test("keys batch independently") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(String, String)]
    val out = Batcher.sizeOrTime(input.toDS(), sizeLimit = 2, timeLimitMs = 600000)
    val q = out.writeStream.format("memory").queryName("batcher_keys")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      input.addData(("a", "1"), ("a", "2"), ("b", "1"))
      assert(waitFor(spark.table("batcher_keys").count() >= 1))
      Thread.sleep(1000) // give b a chance to (wrongly) flush
      val rows = spark.table("batcher_keys").collect()
      assert(rows.length == 1 && rows.head.getAs[String]("key") == "a",
        "only key a filled a batch; b still buffered")
    } finally q.stop()
  }
}
