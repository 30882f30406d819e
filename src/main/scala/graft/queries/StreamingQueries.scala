package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming twins of the batch inventory (SURVEY §2.3 Q23 / §5.3 item 4):
  * the same aggregation executed through Structured Streaming from a file
  * source must match the batch oracle exactly.
  *
  * Scale notes: the tumbling-window aggregate is a streaming state-store
  * aggregation keyed by (window, event_type) — bounded state (hours ×
  * types), partial aggregation map-side per micro-batch. `AvailableNow`
  * processes the backlog in bounded batches then stops, which is also the
  * production backfill pattern.
  */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Q23 via readStream → window(ts, 1 hour) → memory sink (complete). */
  def q23Stream(s: SparkSession, dir: String): DataFrame = {
    // schema as parquet stores it: ts is TIMESTAMP(NANOS) => LongType
    // under nanosAsLong (Sessions sets it)
    val raw = s.read.parquet(s"$dir/events.parquet").schema
    val name = s"q23_stream_${System.nanoTime()}" // unique memory sink
    val stream = s.readStream
      .schema(raw)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"), sum(col("value")).as("v"))
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
      .select(
        col("window.start").cast("string").as("h"),
        col("event_type"),
        col("c"),
        round(col("v"), 4).as("v"))
      .orderBy("h", "event_type")
  }

  /** Sessionization through native session_window in a STREAMING query
    * (complete mode: session state merges across micro-batches), checked
    * against the same DuckDB oracle as the batch lag-based q25 — three
    * independent implementations of the same semantics must agree.
    */
  def q25Stream(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet").schema
    val name = s"q25_stream_${System.nanoTime()}"
    val q = s.readStream
      .schema(raw)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_s", timestamp_seconds(expr("ts div 1000000000")))
      .groupBy(session_window(col("ts_s"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("user_id")
  }

  val queries: Map[String, Q] = Map(
    "q23_stream" -> (q23Stream(_, _)),
    "q25_stream" -> (q25Stream(_, _))
  )

  /** Same oracle as the batch form — that IS the equivalence contract. */
  val oracles: Map[String, String] = Map(
    "q23_stream" -> CoreQueries.oracles("q23_hourly"),
    "q25_stream" -> CoreQueries.oracles("q25_sessionize")
  )
}
