package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** File-backed WAL durability: a broker restart (reset) must recover
  * the un-acked suffix of each exchange log.
  */
class BrokerWalSpec extends AnyFunSuite {
  test("restart replays unacked messages; acked ones stay gone") {
    val dir = java.nio.file.Files.createTempDirectory("broker-wal")
    MemoryBroker.enablePersistence(dir)
    try {
      (0 until 5).foreach(i => MemoryBroker.publish("wal_ex", s"m$i"))
      MemoryBroker.exchange("wal_ex").ack(2) // m0, m1 delivered durably
      MemoryBroker.reset()                   // "restart"
      val log = MemoryBroker.exchange("wal_ex")
      assert(log.committed == 2L)
      assert(log.latest == 5L)
      assert(log.slice(0, 10).map(_.body).toSeq == Seq("m2", "m3", "m4"))
      assert(log.slice(0, 10).map(_.offset).toSeq == Seq(2L, 3L, 4L))
      // new publishes continue the offset sequence after recovery
      assert(log.publish("m5") == 5L)
    } finally {
      MemoryBroker.disablePersistence()
      MemoryBroker.reset()
    }
  }

  test("without persistence, reset loses state (in-memory semantics)") {
    MemoryBroker.publish("mem_ex", "x")
    MemoryBroker.reset()
    assert(MemoryBroker.exchange("mem_ex").latest == 0L)
  }
}
