package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 micro-batch source over a [[BrokerLog]] — the Spark
  * re-expression of the reference's AMQP consumer block (reference
  * amqp.py:36-118): one "queue" per exchange, JSON payloads as a string
  * column, per-message demux + content-type metadata.
  *
  * `format("graftmq")`, options:
  *   - `exchange` (required): exchange/log name to consume
  *   - `broker` (optional): `tcp://host:port` of a [[BrokerServer]] —
  *     the cross-process transport; unset reads the in-JVM
  *     [[MemoryBroker]] (local mode / tests)
  *   - `maxMessagesPerTrigger`: size-axis admission control — together
  *     with `Trigger.ProcessingTime(time_limit)` this reproduces the
  *     reference batcher's size-OR-time contract (batcher.py:54-109,
  *     SURVEY §7.4): a micro-batch closes at the time limit or earlier
  *     when the size cap fills it
  *   - `rowsPerPartition` (default 5000): each admitted offset range is
  *     split into ceil(rows / rowsPerPartition) input partitions, so a
  *     large backlog fans out across executor cores instead of hitting
  *     one task
  *
  * Offsets are log positions; `commit(end)` acks (truncates) the broker
  * log — at-least-once end-to-end, exactly-once with an idempotent sink.
  */
class MqDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftmq"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MqDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MqTable(new CaseInsensitiveStringMap(properties))
}

object MqDataSource {
  val schema: StructType = StructType(Seq(
    StructField("value", StringType),        // raw JSON body
    StructField("exchange", StringType),     // demux key (amqp.py:99)
    StructField("content_type", StringType), // R3 warn path (amqp.py:101-103)
    StructField("offset", LongType),
    StructField("ts", TimestampType)))       // broker-ingest time
}

class MqTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graftmq(${options.get("exchange")})"
  override def schema(): StructType = MqDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new MqScan(opts)
}

class MqScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = MqDataSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MqMicroBatchStream(
      options.get("exchange"),
      Option(options.get("maxMessagesPerTrigger")).map(_.toLong),
      Option(options.get("broker")),
      Option(options.get("rowsPerPartition")).map(_.toInt).getOrElse(5000))
}

case class MqOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

class MqMicroBatchStream(exchangeName: String, maxPerTrigger: Option[Long],
    brokerUrl: Option[String], rowsPerPartition: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  // def, not val: the in-JVM transport must re-resolve the exchange so
  // a broker reset between stream construction and use (tests simulate
  // restarts this way) is observed rather than served from a stale ref
  private def log: BrokerLog = Broker.log(exchangeName, brokerUrl)
  // Trigger.AvailableNow: pin the end of the backlog at start; batches
  // still respect the size cap, the stream stops at the pinned target.
  @volatile private var availableTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(log.latest)

  override def initialOffset(): Offset = MqOffset(log.committed)
  override def deserializeOffset(json: String): Offset = {
    val pos = json.toLong
    // restart: offsets read back from the checkpoint realign a fresh
    // AMQP consumer's client-side offset axis (no-op for other
    // transports). min-wins across calls, so the replayed batch's
    // start — the smallest deserialized offset — anchors the axis.
    log.alignBase(pos)
    MqOffset(pos)
  }

  /** Size-axis admission control (reference size_limit): the admitted
    * end offset — not the planned partitions — is capped, so the
    * checkpointed range always equals what was actually delivered.
    */
  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(m => ReadLimit.maxRows(m)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[MqOffset].pos
    log.alignBase(from)
    // an AvailableNow target pinned before a restart's offset
    // realignment (AMQP transport) can sit below the checkpointed
    // start; such a stale pin is ignored rather than clamping the
    // stream backwards
    val avail = availableTarget match {
      case Some(t) if t >= from => math.min(log.latest, t)
      case _                    => log.latest
    }
    val end = limit match {
      case mr: ReadMaxRows => math.min(avail, from + mr.maxRows)
      case _               => avail
    }
    MqOffset(math.max(from, end))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = MqOffset(log.latest)

  /** The admitted range is chunked into `rowsPerPartition`-sized input
    * partitions. With a `broker` server the partitions carry only
    * (url, exchange, lo, hi) and each EXECUTOR fetches its own slice
    * over TCP — rows never pass through the driver. The in-JVM
    * transport inlines the rows (driver == executor JVM in local mode).
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[MqOffset].pos
    val until = end.asInstanceOf[MqOffset].pos
    log.alignBase(from)
    val rpp = rowsPerPartition.toLong
    val n = math.max(1L, (until - from + rpp - 1) / rpp).toInt
    val bounds = (0 until n).map(i =>
      (from + i * rpp, math.min(until, from + (i + 1) * rpp)))
    brokerUrl match {
      // AMQP offsets exist only in this process's consumer, so rows are
      // inlined into the partitions (Broker.isInlineOnly); the tcp://
      // log-server transport lets each EXECUTOR fetch its own slice
      case Some(url) if !Broker.isInlineOnly(brokerUrl) =>
        bounds.map { case (lo, hi) =>
          MqRemotePartition(url, exchangeName, lo, hi): InputPartition
        }.toArray
      case _ =>
        bounds.map { case (lo, hi) =>
          MqInlinePartition(exchangeName, log.slice(lo, hi)): InputPartition
        }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => p match {
      case ip: MqInlinePartition => new MqPartitionReader(ip.exchange, ip.msgs)
      case rp: MqRemotePartition =>
        val msgs = Broker.log(rp.exchange, Some(rp.url)).slice(rp.from, rp.until)
        new MqPartitionReader(rp.exchange, msgs)
    }

  /** Broker ack AFTER durable commit. Note Spark invokes this while
    * constructing the NEXT micro-batch (cleanUpLastExecutedMicroBatch),
    * so acknowledgement lags one batch — messages stay replayable until
    * then, which only strengthens the at-least-once guarantee.
    */
  override def commit(end: Offset): Unit =
    log.ack(end.asInstanceOf[MqOffset].pos)

  override def stop(): Unit = ()
}

case class MqInlinePartition(exchange: String, msgs: Array[BrokerMessage])
    extends InputPartition

case class MqRemotePartition(url: String, exchange: String, from: Long, until: Long)
    extends InputPartition

class MqPartitionReader(exchange: String, msgs: Array[BrokerMessage])
    extends PartitionReader[InternalRow] {
  private var i = -1
  private val nowUs = System.currentTimeMillis() * 1000L
  override def next(): Boolean = { i += 1; i < msgs.length }
  override def get(): InternalRow = {
    val m = msgs(i)
    InternalRow(
      UTF8String.fromString(m.body),
      UTF8String.fromString(exchange),
      UTF8String.fromString(m.contentType),
      m.offset,
      nowUs)
  }
  override def close(): Unit = ()
}
