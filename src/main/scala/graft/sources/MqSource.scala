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

/** DataSource V2 micro-batch source over [[MemoryBroker]] — the Spark
  * re-expression of the reference's AMQP consumer block (reference
  * amqp.py:36-118): one "queue" per exchange, JSON payloads as a string
  * column, per-message demux metadata.
  *
  * `format("graftmq")`, options:
  *   - `exchange` (required): exchange/log name to consume
  *   - `maxMessagesPerTrigger`: size-axis admission control — together
  *     with `Trigger.ProcessingTime(time_limit)` this reproduces the
  *     reference batcher's size-OR-time contract (batcher.py:54-109,
  *     SURVEY §7.4): a micro-batch closes at the time limit or earlier
  *     when the size cap fills it.
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
    StructField("value", StringType),      // raw JSON body
    StructField("exchange", StringType),   // demux key (amqp.py:99)
    StructField("offset", LongType),
    StructField("ts", TimestampType)))     // broker-ingest time
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
      Option(options.get("maxMessagesPerTrigger")).map(_.toLong))
}

case class MqOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

class MqMicroBatchStream(exchangeName: String, maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  private def log = MemoryBroker.exchange(exchangeName)
  // Trigger.AvailableNow: pin the end of the backlog at start; batches
  // still respect the size cap, the stream stops at the pinned target.
  @volatile private var availableTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(log.latest)

  override def initialOffset(): Offset = MqOffset(log.committed)
  override def deserializeOffset(json: String): Offset = MqOffset(json.toLong)

  /** Size-axis admission control (reference size_limit): the admitted
    * end offset — not the planned partitions — is capped, so the
    * checkpointed range always equals what was actually delivered.
    */
  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(m => ReadLimit.maxRows(m)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[MqOffset].pos
    val avail = availableTarget.fold(log.latest)(math.min(log.latest, _))
    limit match {
      case mr: ReadMaxRows => MqOffset(math.min(avail, from + mr.maxRows))
      case _               => MqOffset(avail)
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = MqOffset(log.latest)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[MqOffset].pos
    val until = end.asInstanceOf[MqOffset].pos
    // Messages ride inside the partition (serialized to executors). On a
    // multi-node cluster this is the standard receiver-less pattern for
    // un-partitioned brokers; per-exchange parallelism comes from running
    // one flow per exchange.
    Array(MqInputPartition(exchangeName, log.slice(from, until)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => new MqPartitionReader(p.asInstanceOf[MqInputPartition])

  /** Broker ack AFTER durable commit. Note Spark invokes this while
    * constructing the NEXT micro-batch (cleanUpLastExecutedMicroBatch),
    * so acknowledgement lags one batch — messages stay replayable until
    * then, which only strengthens the at-least-once guarantee.
    */
  override def commit(end: Offset): Unit =
    log.ack(end.asInstanceOf[MqOffset].pos)

  override def stop(): Unit = ()
}

case class MqInputPartition(exchange: String, msgs: Array[(Long, String)])
    extends InputPartition

class MqPartitionReader(p: MqInputPartition)
    extends PartitionReader[InternalRow] {
  private var i = -1
  private val nowUs = System.currentTimeMillis() * 1000L
  override def next(): Boolean = { i += 1; i < p.msgs.length }
  override def get(): InternalRow = {
    val (off, msg) = p.msgs(i)
    InternalRow(
      UTF8String.fromString(msg),
      UTF8String.fromString(p.exchange),
      off,
      nowUs)
  }
  override def close(): Unit = ()
}
