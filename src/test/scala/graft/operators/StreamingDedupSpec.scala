package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Streaming exact dedup with watermark-bounded state. */
class StreamingDedupSpec extends SparkSpec {
  test("duplicate keys across micro-batches are dropped within watermark") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def ts(min: Int) = new java.sql.Timestamp(86400000L + min * 60000L)
    val dedup = Dedup.streamingExact(
      input.toDF().toDF("ts", "k"), Seq("k"), "ts", "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("sd_test")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      input.addData((ts(0), "a"), (ts(1), "a"), (ts(1), "b"))
      q.processAllAvailable()
      input.addData((ts(2), "a"), (ts(3), "b"), (ts(4), "c")) // a,b dups
      q.processAllAvailable()
      val keys = spark.table("sd_test").collect().map(_.getString(1)).sorted
      assert(keys.toSeq == Seq("a", "b", "c"), keys.mkString(","))
    } finally q.stop()
  }
}
