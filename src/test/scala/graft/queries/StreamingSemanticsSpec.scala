package graft.queries

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Streaming semantics the DuckDB oracle cannot check (SURVEY §5.3):
  * watermark-based late-data drop and session windows.
  */
class StreamingSemanticsSpec extends SparkSpec {

  test("watermark drops rows later than the delay threshold") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .count()
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    def ts(min: Int) = new java.sql.Timestamp(3600L * 1000 * 24 + min * 60000L)
    try {
      input.addData((ts(0), "a"), (ts(2), "a"))
      q.processAllAvailable()
      // advance watermark far past the first window
      input.addData((ts(60), "b"))
      q.processAllAvailable()
      input.addData((ts(61), "b"))
      q.processAllAvailable() // closes window [0,5) => emitted
      val afterClose = spark.table("wm_test").count()
      assert(afterClose >= 1, "closed window must be emitted")
      // this row is now far behind the watermark => dropped
      input.addData((ts(1), "a"))
      q.processAllAvailable()
      input.addData((ts(62), "b"))
      q.processAllAvailable()
      val rows = spark.table("wm_test")
        .filter(col("k") === "a").collect()
      assert(rows.forall(_.getAs[Long]("count") == 2L),
        s"late row must not re-open the closed window: ${rows.mkString}")
    } finally q.stop()
  }

  test("state rows are evicted once the watermark passes (append mode)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def ts(min: Int) = new java.sql.Timestamp(10800L * 1000 * 24 + min * 60000L)
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .count()
    val q = agg.writeStream.format("memory").queryName("evict_test")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      // three open windows -> three state rows
      input.addData((ts(0), "a"), (ts(6), "a"), (ts(11), "b"))
      q.processAllAvailable()
      input.addData((ts(12), "b"))
      q.processAllAvailable()
      val peak = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).max
      assert(peak >= 3, s"expected >=3 open windows in state, got $peak")
      // jump the watermark far past them; the follow-up batch runs the
      // eviction (emit + state cleanup) — this is what bounds state on
      // unbounded input, and what complete mode never exercises
      input.addData((ts(500), "c"))
      q.processAllAvailable()
      input.addData((ts(501), "c"))
      q.processAllAvailable()
      val removed = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
      val last = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(removed >= 3,
        s"windows past the watermark must be evicted (removed=$removed)")
      assert(last < peak, s"state must shrink after eviction: $last vs $peak")
    } finally q.stop()
  }

  test("session_window groups by inactivity gap in streaming") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def ts(min: Int) = new java.sql.Timestamp(7200L * 1000 * 24 + min * 60000L)
    val agg = input.toDF().toDF("ts", "u")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "30 minutes"), col("u"))
      .count()
    val q = agg.writeStream.format("memory").queryName("sw_test")
      .outputMode("append").trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      // two bursts 90 minutes apart => two sessions for u1
      input.addData((ts(0), "u1"), (ts(10), "u1"), (ts(100), "u1"))
      q.processAllAvailable()
      input.addData((ts(300), "u1")) // push watermark to close sessions
      q.processAllAvailable()
      input.addData((ts(301), "u1"))
      q.processAllAvailable()
      val sessions = spark.table("sw_test").collect()
      assert(sessions.length >= 2, s"expected 2 closed sessions, got ${sessions.mkString(";")}")
      val counts = sessions.map(_.getAs[Long]("count")).sorted.toSeq
      assert(counts.take(2) == Seq(1L, 2L) || counts == Seq(1L, 2L),
        s"sessions should hold 2 and 1 events: $counts")
    } finally q.stop()
  }
}
