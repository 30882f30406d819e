package graft.engine

import java.sql.DriverManager

import graft.SparkSpec
import graft.sources.MemoryBroker

/** End-to-end: YAML config -> flow assembly -> graftmq source ->
  * SQL sink, including corrupt-JSON dead-lettering — the full
  * reference dataflow (cli.py:111-167) on Spark.
  */
class FlowsSpec extends SparkSpec {
  test("config-driven flow moves messages from broker to SQL table") {
    val url = "jdbc:derby:memory:flowdb;create=true"
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE logs (msg VARCHAR(100), k INT)")
    c.close()
    val dl = java.nio.file.Files.createTempDirectory("graft-dl").toString
    val cfg = Config.parseString(
      s"""size_limit: 4
         |time_limit: 1
         |blocks:
         |  - name: in
         |    type: amqp
         |    kwargs: {}
         |  - name: out
         |    type: sql
         |    kwargs:
         |      url: '$url'
         |flows:
         |  - - name: in
         |      kwargs:
         |        exchange: e2e
         |    - name: out
         |      kwargs:
         |        query: "INSERT INTO logs (msg, k) VALUES (:m, CAST(:k AS INT))"
         |        dead_letter_dir: '$dl'
         |        parameters:
         |          m: message.text
         |          k: k
         |""".stripMargin)
    (1 to 6).foreach(i =>
      MemoryBroker.publish("e2e", s"""{"message":{"text":"m$i"},"k":$i}"""))
    MemoryBroker.publish("e2e", "not json at all {")
    val ckpt = java.nio.file.Files.createTempDirectory("flow-ckpt").toString
    val q = Flows.startFlow(spark, cfg, cfg.flows.head, ckpt, "e2e_flow")
    try {
      val deadline = System.currentTimeMillis() + 60000
      def count(): Int = {
        val cc = DriverManager.getConnection(url)
        try {
          val rs = cc.createStatement().executeQuery("SELECT COUNT(*) FROM logs")
          rs.next(); rs.getInt(1)
        } finally cc.close()
      }
      while (count() < 6 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(count() == 6)
      val cc = DriverManager.getConnection(url)
      val rs = cc.createStatement().executeQuery(
        "SELECT msg FROM logs WHERE k = 3")
      rs.next(); assert(rs.getString(1) == "m3"); cc.close()
      // corrupt message was dead-lettered, not inserted and not fatal
      val deadline2 = System.currentTimeMillis() + 30000
      def deadCount(): Long =
        try spark.read.parquet(s"$dl/corrupt").count() catch { case _: Exception => 0L }
      while (deadCount() < 1 && System.currentTimeMillis() < deadline2)
        Thread.sleep(200)
      assert(deadCount() == 1L)
    } finally q.stop()
  }

  test("clean micro-batches run ONE action (no per-batch count/isEmpty)") {
    val url = "jdbc:derby:memory:actdb;create=true"
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE actlogs (v VARCHAR(100))")
    c.close()
    // count action names fired through the session while the flow runs;
    // the old writer cost a count() (content-type warn) + isEmpty()
    // (corrupt split) per micro-batch on top of the sink action
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        seen.merge(funcName, 1, (a, b) => a + b)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    (1 to 5).foreach(i => MemoryBroker.publish("act_ex", s"""{"v":"a$i"}"""))
    val cfg = Config.parseString(
      s"""size_limit: 8
         |time_limit: 1
         |blocks:
         |  - name: in
         |    type: amqp
         |    kwargs: {}
         |  - name: out
         |    type: sql
         |    kwargs:
         |      url: '$url'
         |flows:
         |  - - name: in
         |      kwargs:
         |        exchange: act_ex
         |    - name: out
         |      kwargs:
         |        query: "INSERT INTO actlogs (v) VALUES (:v)"
         |        parameters:
         |          v: v
         |""".stripMargin)
    val ckpt = java.nio.file.Files.createTempDirectory("act-ckpt").toString
    spark.listenerManager.register(listener)
    val q = Flows.startFlow(spark, cfg, cfg.flows.head, ckpt, "act_flow")
    try {
      val deadline = System.currentTimeMillis() + 60000
      def count(): Int = {
        val cc = DriverManager.getConnection(url)
        try {
          val rs = cc.createStatement().executeQuery("SELECT COUNT(*) FROM actlogs")
          rs.next(); rs.getInt(1)
        } finally cc.close()
      }
      while (count() < 5 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(count() == 5)
      // the sink action ran; the per-batch metric actions did not
      assert(seen.getOrDefault("foreachPartition", 0) >= 1)
      assert(seen.getOrDefault("count", 0) == 0,
        s"writer must not run a per-batch count(): $seen")
      assert(seen.getOrDefault("isEmpty", 0) == 0,
        s"writer must not run a per-batch isEmpty(): $seen")
    } finally {
      q.stop()
      spark.listenerManager.unregister(listener)
    }
  }

  test("exchange_declare_kwargs from YAML reach the broker (R2)") {
    val url = "jdbc:derby:memory:decldb;create=true"
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE dummy (v VARCHAR(10))")
    c.close()
    val cfg = Config.parseString(
      s"""size_limit: 4
         |time_limit: 1
         |blocks:
         |  - name: in
         |    type: amqp
         |    kwargs: {}
         |  - name: out
         |    type: sql
         |    kwargs:
         |      url: '$url'
         |flows:
         |  - - name: in
         |      kwargs:
         |        exchange: decl_flow_ex
         |        exchange_declare_kwargs:
         |          exchange_type: fanout
         |          durable: 'true'
         |    - name: out
         |      kwargs:
         |        query: "INSERT INTO dummy (v) VALUES (:v)"
         |        parameters:
         |          v: v
         |""".stripMargin)
    val ckpt = java.nio.file.Files.createTempDirectory("decl-ckpt").toString
    val q = Flows.startFlow(spark, cfg, cfg.flows.head, ckpt, "decl_flow")
    try assert(MemoryBroker.declared("decl_flow_ex") ==
      Map("exchange_type" -> "fanout", "durable" -> "true"))
    finally q.stop()
  }

  test("exchange_declare_kwargs: nested arguments map is flattened (R2)") {
    val url = "jdbc:derby:memory:declargdb;create=true"
    val c = DriverManager.getConnection(url)
    try c.createStatement().execute("CREATE TABLE dummy2 (v VARCHAR(10))")
    catch { case _: java.sql.SQLException => () }
    finally c.close()
    val cfg = Config.parseString(
      s"""size_limit: 4
         |time_limit: 1
         |blocks:
         |  - name: in
         |    type: amqp
         |    kwargs: {}
         |  - name: out
         |    type: sql
         |    kwargs:
         |      url: '$url'
         |flows:
         |  - - name: in
         |      kwargs:
         |        exchange: decl_args_ex
         |        exchange_declare_kwargs:
         |          auto_delete: 'true'
         |          arguments:
         |            x-message-ttl: 60000
         |    - name: out
         |      kwargs:
         |        query: "INSERT INTO dummy2 (v) VALUES (:v)"
         |        parameters:
         |          v: v
         |""".stripMargin)
    val ckpt = java.nio.file.Files.createTempDirectory("declarg-ckpt").toString
    val q = Flows.startFlow(spark, cfg, cfg.flows.head, ckpt, "decl_args_flow")
    try assert(MemoryBroker.declared("decl_args_ex") ==
      Map("auto_delete" -> "true", "arguments.x-message-ttl" -> "60000"))
    finally q.stop()
  }

  test("exchange_declare_kwargs: unknown kwarg fails the flow at bind time (R17 parity)") {
    // the reference forwards kwargs to pika verbatim, so a typo or a
    // queue-level kwarg (exclusive) crashes it at bind time with
    // TypeError; the engine must fail the same config at the same
    // moment, not silently accept an inert key
    val url = "jdbc:derby:memory:declbaddb;create=true"
    val c = DriverManager.getConnection(url)
    try c.createStatement().execute("CREATE TABLE dummy3 (v VARCHAR(10))")
    catch { case _: java.sql.SQLException => () }
    finally c.close()
    val cfg = Config.parseString(
      s"""size_limit: 4
         |time_limit: 1
         |blocks:
         |  - name: in
         |    type: amqp
         |    kwargs: {}
         |  - name: out
         |    type: sql
         |    kwargs:
         |      url: '$url'
         |flows:
         |  - - name: in
         |      kwargs:
         |        exchange: decl_bad_ex
         |        exchange_declare_kwargs:
         |          exclusive: 'true'
         |    - name: out
         |      kwargs:
         |        query: "INSERT INTO dummy3 (v) VALUES (:v)"
         |        parameters:
         |          v: v
         |""".stripMargin)
    val ckpt = java.nio.file.Files.createTempDirectory("declbad-ckpt").toString
    val e = intercept[IllegalArgumentException] {
      Flows.startFlow(spark, cfg, cfg.flows.head, ckpt, "decl_bad_flow")
    }
    assert(e.getMessage.contains("exclusive"))
  }

  test("non-JSON content type is warned about but forwarded (R3 first half)") {
    val url = "jdbc:derby:memory:ctdb;create=true"
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE ctlogs (v VARCHAR(100))")
    c.close()
    // a JSON-parseable body published under a non-JSON content type:
    // the reference warns (amqp.py:101-103) and processes it anyway
    MemoryBroker.publish("ct_ex", """{"v":"forwarded"}""",
      contentType = "text/plain")
    val cfg = Config.parseString(
      s"""size_limit: 4
         |time_limit: 1
         |blocks:
         |  - name: in
         |    type: amqp
         |    kwargs: {}
         |  - name: out
         |    type: sql
         |    kwargs:
         |      url: '$url'
         |flows:
         |  - - name: in
         |      kwargs:
         |        exchange: ct_ex
         |    - name: out
         |      kwargs:
         |        query: "INSERT INTO ctlogs (v) VALUES (:v)"
         |        parameters:
         |          v: v
         |""".stripMargin)
    val ckpt = java.nio.file.Files.createTempDirectory("ct-ckpt").toString
    val q = Flows.startFlow(spark, cfg, cfg.flows.head, ckpt, "ct_flow")
    try {
      val deadline = System.currentTimeMillis() + 60000
      def one(): Option[String] = {
        val cc = DriverManager.getConnection(url)
        try {
          val rs = cc.createStatement().executeQuery("SELECT v FROM ctlogs")
          if (rs.next()) Some(rs.getString(1)) else None
        } finally cc.close()
      }
      while (one().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(one().contains("forwarded"))
    } finally q.stop()
  }
}
