package graft.sources

import java.nio.file.{Files, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite

/** WAL lifecycle hygiene for a long-lived exchange: acked entries are
  * compacted out of the file, and a torn final line (crash mid-append)
  * is truncated at recovery instead of failing the broker start.
  * Pure-JVM spec — no Spark session needed.
  */
class WalHygieneSpec extends AnyFunSuite {

  private def tmp() = Files.createTempDirectory("wal-hygiene")

  private def walLines(dir: java.nio.file.Path, name: String) = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(dir.resolve(s"$name.wal")).asScala.toSeq
  }

  test("ack past the threshold compacts acked entries out of the WAL") {
    val dir = tmp()
    val log = new ExchangeLog("cmp", Some(dir), compactEvery = 5)
    (0 until 10).foreach(i => log.publish(s"""{"i":$i}"""))
    assert(walLines(dir, "cmp").size == 10)
    log.ack(3) // below threshold: no rewrite yet
    assert(walLines(dir, "cmp").size == 10)
    log.ack(7) // 7 acked >= 5: compacted to the live suffix
    val lines = walLines(dir, "cmp")
    assert(lines.size == 3, s"expected 3 live lines, got ${lines.size}")
    assert(lines.head.startsWith("7\t"), s"first live offset: ${lines.head}")
    // recovery from the compacted WAL yields exactly the live suffix
    val log2 = new ExchangeLog("cmp", Some(dir))
    assert(log2.committed == 7L && log2.latest == 10L)
    assert(log2.slice(0, 100).map(_.offset).toSeq == Seq(7L, 8L, 9L))
    assert(log2.slice(7, 10).map(_.body).toSeq ==
      (7 until 10).map(i => s"""{"i":$i}"""))
  }

  test("repeated ack/compact cycles keep the WAL bounded") {
    val dir = tmp()
    val log = new ExchangeLog("cyc", Some(dir), compactEvery = 4)
    var off = 0L
    (1 to 5).foreach { _ =>
      (0 until 8).foreach(i => log.publish(s"m$i"))
      off += 8
      log.ack(off)
    }
    // every batch fully acked; the WAL never holds more than one
    // inter-compaction window of dead lines
    assert(walLines(dir, "cyc").size <= 4)
    val log2 = new ExchangeLog("cyc", Some(dir))
    assert(log2.committed == 40L && log2.latest == 40L)
  }

  test("a torn final WAL line is truncated at recovery, not fatal") {
    val dir = tmp()
    val log = new ExchangeLog("torn", Some(dir))
    log.publish("""{"a":1}""")
    log.publish("""{"a":2}""")
    // crash mid-append: a partial record with no tab-separated fields
    Files.writeString(dir.resolve("torn.wal"), "2\tQUJ",
      StandardOpenOption.APPEND)
    val recovered = new ExchangeLog("torn", Some(dir))
    assert(recovered.latest == 2L, "intact prefix must survive")
    assert(recovered.slice(0, 10).map(_.body).toSeq ==
      Seq("""{"a":1}""", """{"a":2}"""))
    // the torn tail is gone from disk, and the log is writable again
    assert(walLines(dir, "torn").size == 2)
    assert(recovered.publish("""{"a":3}""") == 2L)
    val again = new ExchangeLog("torn", Some(dir))
    assert(again.slice(0, 10).map(_.body).toSeq ==
      Seq("""{"a":1}""", """{"a":2}""", """{"a":3}"""))
  }

  test("torn garbage line alone (no valid prefix) recovers to empty") {
    val dir = tmp()
    Files.writeString(dir.resolve("junk.wal"), "garb@ge not a record")
    val log = new ExchangeLog("junk", Some(dir))
    assert(log.latest == 0L && log.committed == 0L)
    assert(log.publish("x") == 0L)
  }
}
