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
  final class ExchangeLog(name: String, walDir: Option[java.nio.file.Path]) {
    private val buf = ArrayBuffer.empty[String]
    private var base = 0L                  // offset of buf(0)
    private var nacked = 0L                // corrupt-drop counter (stats)

    private val walFile = walDir.map(_.resolve(s"$name.wal"))
    private val commitFile = walDir.map(_.resolve(s"$name.committed"))

    // Recovery: un-acked suffix of the WAL is replayed into the buffer,
    // so a broker restart preserves at-least-once delivery.
    walFile.foreach { wf =>
      if (java.nio.file.Files.exists(wf)) {
        val committed = commitFile
          .filter(java.nio.file.Files.exists(_))
          .map(f => java.nio.file.Files.readString(f).trim.toLong)
          .getOrElse(0L)
        val lines = java.nio.file.Files.readAllLines(wf)
        base = committed
        lines.forEach { l =>
          val i = l.indexOf('\t')
          val off = l.substring(0, i).toLong
          if (off >= committed) buf += l.substring(i + 1)
        }
      }
    }

    def publish(msg: String): Long = synchronized {
      val off = base + buf.size
      buf += msg
      walFile.foreach(wf => java.nio.file.Files.writeString(wf,
        s"$off\t$msg\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND))
      off
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
      commitFile.foreach(f => java.nio.file.Files.writeString(f, base.toString))
    }
    def nack(): Unit = synchronized { nacked += 1 }
    def nackCount: Long = synchronized { nacked }
  }

  private val exchanges = new ConcurrentHashMap[String, ExchangeLog]()
  @volatile private var walDir: Option[java.nio.file.Path] = None

  /** Enable file-backed WAL durability for exchanges created after this
    * call: publishes append to `<dir>/<exchange>.wal`, acks persist the
    * committed offset, and a restarted broker replays the un-acked
    * suffix (SURVEY §7.4's "file-backed WAL later" upgrade).
    */
  def enablePersistence(dir: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dir)
    walDir = Some(dir)
  }
  def disablePersistence(): Unit = walDir = None

  def exchange(name: String): ExchangeLog =
    exchanges.computeIfAbsent(name, n => new ExchangeLog(n, walDir))

  def publish(exchangeName: String, msg: String): Long =
    exchange(exchangeName).publish(msg)

  /** Drops in-memory state (exchanges re-created lazily — with WAL
    * enabled they recover from disk, simulating a broker restart).
    */
  def reset(): Unit = exchanges.clear()
}
