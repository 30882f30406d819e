package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sinks.SqlSink

/** Flow assembly: config -> one StreamingQuery per flow (the Spark
  * re-expression of the reference's `create_flow` wiring,
  * cli.py:111-167). The implicit per-flow Batcher (docs/usage.rst:89-91)
  * becomes the micro-batch boundary: `Trigger.ProcessingTime(time_limit)`
  * is the time axis, source-side `maxMessagesPerTrigger = size_limit`
  * the size axis (SURVEY §7.4).
  *
  * Input block types:
  *   - `amqp` / `mq`: the graftmq DataSource V2 ([[graft.sources.MqDataSource]])
  *   - `file`: file-source streaming (parquet/json dir), used in tests
  * Output block types:
  *   - `sql`: [[SqlSink]] foreachBatch JDBC writer
  *   - `parquet`: append parquet sink (bench/tests)
  */
object Flows extends org.apache.spark.internal.Logging {

  /** Corrupt-JSON dead-lettering (reference amqp.py:107-109: nack, no
    * requeue — message leaves the pipeline but is observable): a row is
    * valid iff the body parses as a JSON object/array.
    */
  def validJson(df: DataFrame, jsonCol: String): DataFrame =
    df.filter(get_json_object(col(jsonCol), "$").isNotNull)

  def invalidJson(df: DataFrame, jsonCol: String): DataFrame =
    df.filter(get_json_object(col(jsonCol), "$").isNull)

  /** R3 first half (reference amqp.py:101-103): a message whose
    * content type is not JSON gets a logged WARNING but is still
    * forwarded — only bodies that fail to parse dead-letter. Expressed
    * as an aggregate so it can ride the sink's own job via `observe()`
    * instead of costing a separate count() action per micro-batch.
    */
  def nonJsonContentTypeCount(batch: DataFrame): Column =
    if (batch.columns.contains("content_type"))
      sum(when(col("content_type").isNotNull &&
        col("content_type") =!= "application/json", 1L).otherwise(0L))
    else sum(lit(0L))

  def start(spark: SparkSession, cfg: Config.Engine,
      checkpointRoot: String): Seq[StreamingQuery] = {
    Metrics.register(spark)
    cfg.flows.zipWithIndex.map { case (flow, i) =>
      startFlow(spark, cfg, flow, s"$checkpointRoot/flow$i", s"flow$i")
    }
  }

  def startFlow(spark: SparkSession, cfg: Config.Engine, flow: Config.Flow,
      checkpoint: String, name: String): StreamingQuery = {
    val inBlock = cfg.block(flow.input.name)
    val outBlock = cfg.block(flow.output.name)
    val kin = flow.input.kwargs
    val kout = flow.output.kwargs

    val stream: DataFrame = inBlock.typ match {
      case "amqp" | "mq" =>
        val exchangeName = kin.getOrElse("exchange",
          throw new IllegalArgumentException("flow input needs an exchange")).toString
        val brokerUrl = kin.get("broker").orElse(inBlock.kwargs.get("broker"))
          .map(_.toString)
        // exchange_declare kwargs passthrough (reference amqp.py:55-78):
        // declared on bind, before the stream starts consuming
        kin.get("exchange_declare_kwargs").foreach {
          case m: java.util.Map[_, _] =>
            import scala.jdk.CollectionConverters._
            // a nested `arguments:` map (pika's arguments dict) is
            // flattened to `arguments.<key>` entries; Broker.declare
            // validates the key set (pika parity — unknown kwargs fail
            // the flow at bind time, like the reference's TypeError)
            val flat = m.asScala.iterator.flatMap {
              case (k, vm: java.util.Map[_, _]) if k.toString == "arguments" =>
                vm.asScala.map { case (ak, av) =>
                  s"arguments.$ak" -> String.valueOf(av) }
              case (k, v) => Iterator.single(k.toString -> String.valueOf(v))
            }.toMap
            graft.sources.Broker.declare(exchangeName, brokerUrl, flat)
          case other => throw new IllegalArgumentException(
            s"exchange_declare_kwargs must be a map, got ${other.getClass.getSimpleName}")
        }
        val r = spark.readStream.format("graftmq")
          .option("exchange", exchangeName)
          .option("maxMessagesPerTrigger", cfg.sizeLimit.toString)
        // cross-process transport: block-level `broker: tcp://host:port`
        brokerUrl.foreach(b => r.option("broker", b))
        r.load()
      case "file" =>
        val dir = inBlock.kwargs("path").toString
        val fmt = inBlock.kwargs.getOrElse("format", "parquet").toString
        val schema = spark.read.format(fmt).load(dir).schema
        val r = spark.readStream.format(fmt).schema(schema)
        kin.get("pathGlobFilter").foreach(g => r.option("pathGlobFilter", g.toString))
        r.load(dir)
      case other =>
        throw new IllegalArgumentException(s"unknown input block type: $other")
    }

    val deadLetter = kout.get("dead_letter_dir").map(_.toString)
    val writer = outBlock.typ match {
      case "sql" =>
        val url = outBlock.kwargs("url").toString
        val query = kout("query").toString
        val mapping = kout.get("parameters") match {
          case None => SqlSink.Identity
          case Some(l: java.util.List[_]) =>
            SqlSink.Positional(l.toArray.map(_.toString).toSeq)
          case Some(m: java.util.Map[_, _]) =>
            import scala.jdk.CollectionConverters._
            SqlSink.Named(m.asScala.toSeq.map { case (k, v) =>
              k.toString -> v.toString })
          case Some(other) =>
            // reference sql.py:88-90: invalid parameters type => error
            throw new IllegalArgumentException(
              s"invalid parameters type: ${other.getClass.getSimpleName}")
        }
        // schema-less flows bind dotted paths against the raw JSON body
        val jsonCol = if (stream.columns.contains("value")) Some("value") else None
        // idempotent: true => batchId-keyed replay protection (exactly-
        // once with the checkpointed replayable source)
        val sink =
          if (kout.get("idempotent").exists(_.toString.toBoolean))
            SqlSink.idempotentForeachBatch(url, query, mapping, name,
              jsonCol)
          else SqlSink.foreachBatch(url, query, mapping, jsonCol, deadLetter)
        (batch0: DataFrame, id: Long) => {
          // ONE action per micro-batch on the happy path: the
          // content-type warn count and the corrupt-JSON count ride the
          // sink's own job as observe() metrics. The dead-letter write
          // (a second action) runs only when the metric says corrupt
          // rows actually exist — the cache makes that re-read cheap.
          val batch = batch0.persist()
          try {
            val corruptCount = jsonCol match {
              case Some(c) => sum(when(
                get_json_object(col(c), "$").isNull, 1L).otherwise(0L))
              case None => sum(lit(0L))
            }
            val obs = new org.apache.spark.sql.Observation()
            val observed = batch.observe(obs,
              nonJsonContentTypeCount(batch).as("non_json_ct"),
              corruptCount.as("corrupt"))
            val valid = jsonCol.fold(observed)(c => validJson(observed, c))
            sink(valid, id)
            // bounded fetch: on success the metrics arrive with the job's
            // SQLExecutionEnd event (ms); if the best-effort sink swallowed
            // a job failure the event may never carry metrics — give up
            // after ~2 s instead of blocking the stream on obs.get
            val deadline = System.currentTimeMillis() + 2000
            var m = org.apache.spark.sql.GraftBridge.observedOrEmpty(obs)
            while (m.isEmpty && System.currentTimeMillis() < deadline)
              m = org.apache.spark.sql.GraftBridge.observedOrEmpty(obs) // ~100 ms internal wait per call
            def metric(k: String): Long =
              m.get(k).flatMap(Option(_)).map(_.toString.toLong).getOrElse(0L)
            if (metric("non_json_ct") > 0) logWarning(
              s"${metric("non_json_ct")} message(s) with non-JSON content " +
                "type received; forwarding anyway")
            if (metric("corrupt") > 0) for (c <- jsonCol; d <- deadLetter)
              invalidJson(batch, c).write.mode("append").parquet(s"$d/corrupt")
          } finally { batch.unpersist(); () }
        }
      case "parquet" =>
        val path = outBlock.kwargs("path").toString
        (batch: DataFrame, id: Long) =>
          batch.write.mode("append").parquet(path)
      case other =>
        throw new IllegalArgumentException(s"unknown output block type: $other")
    }

    stream.writeStream
      .queryName(name)
      .foreachBatch(writer)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(s"${cfg.timeLimit} seconds"))
      .start()
  }
}
