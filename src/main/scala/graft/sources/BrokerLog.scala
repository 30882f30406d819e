package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.Base64

import scala.collection.mutable.ArrayBuffer

/** One message in an exchange log: offset, AMQP-style content type
  * (reference amqp.py:101-103 inspects `properties.content_type`),
  * raw body.
  */
case class BrokerMessage(offset: Long, contentType: String, body: String)

/** Transport-agnostic contract between the graftmq Spark source and a
  * broker: an append-only offset log per exchange with post-commit
  * truncation (ack). Implementations:
  *
  *   - [[MemoryBroker]]'s in-JVM [[ExchangeLog]] — local mode / tests;
  *   - [[BrokerClient]] over TCP to a [[BrokerServer]] — the
  *     cross-process deployment shape, where the broker is its own
  *     process (like the reference's RabbitMQ, amqp.py:40-49) and the
  *     Spark driver/executors only speak the wire protocol.
  */
trait BrokerLog {
  def publish(body: String, contentType: String = "application/json"): Long
  /** Messages in [from, until), capped at the log end. */
  def slice(from: Long, until: Long): Array[BrokerMessage]
  def latest: Long
  def committed: Long
  /** Ack == truncate the log below `until` (post-commit). */
  def ack(until: Long): Unit
  def nack(): Unit
  def nackCount: Long
}

/** The broker-side log: an in-memory buffer with an optional file WAL.
  * WAL lines are `<offset>\t<b64(contentType)>\t<b64(body)>` — payloads
  * are base64-encoded so bodies containing newlines/tabs survive
  * recovery intact (a raw-text WAL would corrupt the at-least-once
  * replay for such messages).
  *
  * The reference acks before processing (at-most-once; reference
  * amqp.py:116-118). Here the log is the source of truth: offsets index
  * it, Spark's checkpoint decides replay, and [[ack]] (called from the
  * stream's `commit`) truncates — i.e. broker acknowledgement happens
  * only after a micro-batch is durably committed, upgrading delivery to
  * at-least-once (SURVEY §7.4, a documented deliberate divergence).
  */
final class ExchangeLog(name: String, walDir: Option[Path]) extends BrokerLog {
  private case class Entry(contentType: String, body: String)
  private val buf = ArrayBuffer.empty[Entry]
  private var base = 0L                  // offset of buf(0)
  private var nacked = 0L                // corrupt-drop counter (stats)

  private val walFile = walDir.map(_.resolve(s"$name.wal"))
  private val commitFile = walDir.map(_.resolve(s"$name.committed"))

  private def b64e(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(UTF_8))
  private def b64d(s: String): String =
    new String(Base64.getDecoder.decode(s), UTF_8)

  // Recovery: un-acked suffix of the WAL is replayed into the buffer,
  // so a broker restart preserves at-least-once delivery.
  walFile.foreach { wf =>
    if (Files.exists(wf)) {
      val committedOff = commitFile
        .filter(Files.exists(_))
        .map(f => Files.readString(f).trim.toLong)
        .getOrElse(0L)
      base = committedOff
      Files.readAllLines(wf).forEach { l =>
        val parts = l.split("\t", 3)
        val off = parts(0).toLong
        if (off >= committedOff) buf += Entry(b64d(parts(1)), b64d(parts(2)))
      }
    }
  }

  override def publish(body: String,
      contentType: String = "application/json"): Long = synchronized {
    val off = base + buf.size
    buf += Entry(contentType, body)
    walFile.foreach(wf => Files.writeString(wf,
      s"$off\t${b64e(contentType)}\t${b64e(body)}\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND))
    off
  }

  override def slice(from: Long, until: Long): Array[BrokerMessage] = synchronized {
    val lo = math.max(from, base)
    val hi = math.min(until, base + buf.size)
    (lo until hi).map { o =>
      val e = buf((o - base).toInt)
      BrokerMessage(o, e.contentType, e.body)
    }.toArray
  }

  override def latest: Long = synchronized { base + buf.size }
  override def committed: Long = synchronized { base }

  override def ack(until: Long): Unit = synchronized {
    val n = math.min(math.max(until - base, 0), buf.size.toLong).toInt
    buf.remove(0, n); base += n
    commitFile.foreach(f => Files.writeString(f, base.toString))
  }

  override def nack(): Unit = synchronized { nacked += 1 }
  override def nackCount: Long = synchronized { nacked }
}
