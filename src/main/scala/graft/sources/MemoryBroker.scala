package graft.sources

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable.ArrayBuffer

/** In-JVM message broker with AMQP-shaped semantics (named exchanges,
  * publish, consume) upgraded with a *replayable offset log* per
  * exchange so a Spark `MicroBatchStream` can read it transactionally.
  *
  * The reference acks before processing (at-most-once; reference
  * amqp.py:116-118). Here the log is the source of truth: offsets index
  * it, Spark's checkpoint decides replay, and [[ack]] (called from the
  * stream's `commit`) truncates — i.e. broker acknowledgement happens
  * only after a micro-batch is durably committed, upgrading delivery to
  * at-least-once (SURVEY §7.4, a documented deliberate divergence).
  *
  * Scale path: this driver-side buffer is the local-mode/test transport.
  * Against a real AMQP broker the same offset model holds with the log
  * kept as a file-backed WAL written by the consumer thread; the Spark
  * source code is transport-agnostic (it only sees [[slice]]/[[ack]]).
  */
object MemoryBroker {
  final class ExchangeLog {
    private val buf = ArrayBuffer.empty[String]
    private var base = 0L                  // offset of buf(0)
    private var nacked = 0L                // corrupt-drop counter (stats)

    def publish(msg: String): Long = synchronized {
      buf += msg; base + buf.size - 1
    }
    /** Messages in [from, until), capped at the log end. */
    def slice(from: Long, until: Long): Array[(Long, String)] = synchronized {
      val lo = math.max(from, base)
      val hi = math.min(until, base + buf.size)
      (lo until hi).map(o => o -> buf((o - base).toInt)).toArray
    }
    def latest: Long = synchronized { base + buf.size }
    def committed: Long = synchronized { base }
    /** Ack == truncate the log below `until` (post-commit). */
    def ack(until: Long): Unit = synchronized {
      val n = math.min(math.max(until - base, 0), buf.size.toLong).toInt
      buf.remove(0, n); base += n
    }
    def nack(): Unit = synchronized { nacked += 1 }
    def nackCount: Long = synchronized { nacked }
  }

  private val exchanges = new ConcurrentHashMap[String, ExchangeLog]()

  def exchange(name: String): ExchangeLog =
    exchanges.computeIfAbsent(name, _ => new ExchangeLog)

  def publish(exchangeName: String, msg: String): Long =
    exchange(exchangeName).publish(msg)

  def reset(): Unit = exchanges.clear()
}
