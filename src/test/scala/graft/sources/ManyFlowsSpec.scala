package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Many flows against ONE broker process: the repo uses one source
  * instance per flow (documented §7.4 divergence from the reference's
  * single shared queue), and the client opens one short-lived TCP
  * connection per operation — so the broker's connection cost must
  * scale with in-flight OPERATIONS, not with the number of flows, and
  * every connection must close. This spec measures exactly that.
  */
class ManyFlowsSpec extends SparkSpec {

  test("6 flows, one broker: all drain; connections bounded and closed") {
    val srv = new BrokerServer(0, None)
    val nFlows = 6
    val perFlow = 8
    try {
      val url = s"tcp://localhost:${srv.boundPort}"
      (0 until nFlows).foreach { f =>
        val c = new BrokerClient("localhost", srv.boundPort, s"mf_ex$f")
        (1 to perFlow).foreach(i => c.publish(s"""{"f":$f,"i":$i}"""))
      }
      val got = new ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicInteger]()
      val queries = (0 until nFlows).map { f =>
        spark.readStream.format("graftmq")
          .option("exchange", s"mf_ex$f")
          .option("broker", url)
          .load()
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            val n = b.count().toInt
            got.computeIfAbsent(f,
              _ => new java.util.concurrent.atomic.AtomicInteger).addAndGet(n)
            ()
          }
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory(s"mf-ckpt$f").toString)
          .trigger(Trigger.AvailableNow())
          .start()
      }
      queries.foreach(_.awaitTermination(90000))
      queries.foreach(_.stop())
      (0 until nFlows).foreach(f =>
        assert(got.get(f) != null && got.get(f).get == perFlow,
          s"flow $f drained ${Option(got.get(f)).map(_.get)}"))
      // per-operation connections: many accepted over the run...
      assert(srv.connectionsAccepted > nFlows.toLong,
        s"accepted=${srv.connectionsAccepted}")
      // ...but concurrency is bounded by in-flight ops (a handful per
      // flow), nowhere near the total operation count
      assert(srv.connectionsPeak <= 4L * nFlows,
        s"peak=${srv.connectionsPeak} accepted=${srv.connectionsAccepted}")
      assert(srv.connectionsPeak < srv.connectionsAccepted)
      // and every connection is closed once the flows stop
      val deadline = System.currentTimeMillis() + 10000
      while (srv.connectionsOpen > 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(srv.connectionsOpen == 0, s"open=${srv.connectionsOpen}")
    } finally srv.stop()
  }
}
