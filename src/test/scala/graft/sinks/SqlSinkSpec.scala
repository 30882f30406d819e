package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class SqlSinkSpec extends SparkSpec {
  private def derby(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def queryOne[T](url: String, sql: String)(f: java.sql.ResultSet => T): T = {
    val c = DriverManager.getConnection(url)
    try { val rs = c.createStatement().executeQuery(sql); rs.next(); f(rs) }
    finally c.close()
  }

  test("compile turns :named params into positional with order") {
    val (sql, names) = SqlSink.compile(
      "INSERT INTO t (a, b) VALUES (CAST(:x AS INT), :y_2)")
    assert(sql == "INSERT INTO t (a, b) VALUES (CAST(? AS INT), ?)")
    assert(names == Seq("x", "y_2"))
  }

  test("compile ignores quoted literals and postgres-style casts") {
    val (sql1, names1) = SqlSink.compile(
      "INSERT INTO t (a, b) VALUES (:a, 'x:y')")
    assert(sql1 == "INSERT INTO t (a, b) VALUES (?, 'x:y')")
    assert(names1 == Seq("a"))
    val (sql2, names2) = SqlSink.compile(
      "INSERT INTO t (a) VALUES (:a::bigint)")
    assert(sql2 == "INSERT INTO t (a) VALUES (?::bigint)")
    assert(names2 == Seq("a"))
    // '' is the in-literal escape: everything stays quoted text
    val (sql3, names3) = SqlSink.compile(
      "INSERT INTO t (a, b) VALUES ('it''s :not_a_param', :b)")
    assert(sql3 == "INSERT INTO t (a, b) VALUES ('it''s :not_a_param', ?)")
    assert(names3 == Seq("b"))
  }

  test("named mapping extracts dotted paths from raw JSON bodies") {
    val url = derby("named")
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE logs (msg VARCHAR(100), k INT)")
    c.close()
    val s = spark
    val df = s.createDataset(Seq(
      """{"message":{"text":"hello"},"k":1}""",
      """{"message":{"text":"world"},"k":2}"""
    ))(org.apache.spark.sql.Encoders.STRING).toDF("value")
    val sink = SqlSink.foreachBatch(url,
      "INSERT INTO logs (msg, k) VALUES (:msg, CAST(:k AS INT))",
      SqlSink.Named(Seq("msg" -> "message.text", "k" -> "k")),
      jsonCol = Some("value"))
    sink(df, 0L)
    assert(queryOne(url, "SELECT COUNT(*) FROM logs")(_.getInt(1)) == 2)
    assert(queryOne(url,
      "SELECT msg FROM logs WHERE k = 1")(_.getString(1)) == "hello")
  }

  test("missing path binds NULL; residual nesting binds a JSON string") {
    val url = derby("nulls")
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE t (a VARCHAR(200), b VARCHAR(200))")
    c.close()
    val s = spark
    val df = s.createDataset(Seq("""{"nested":{"x":1}}"""))(
      org.apache.spark.sql.Encoders.STRING).toDF("value")
    SqlSink.foreachBatch(url, "INSERT INTO t (a, b) VALUES (:a, :b)",
      SqlSink.Named(Seq("a" -> "nope.deeper", "b" -> "nested")),
      jsonCol = Some("value"))(df, 0L)
    val (a, b) = queryOne(url, "SELECT a, b FROM t")(r =>
      (r.getString(1), r.getString(2)))
    assert(a == null)
    assert(b == """{"x":1}""")
  }

  test("error policy: failed batch is dropped, pipeline continues (R14)") {
    val url = derby("errs")
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE small (v VARCHAR(3))")
    c.close()
    val s = spark
    val sink = SqlSink.foreachBatch(url, "INSERT INTO small (v) VALUES (:v)",
      SqlSink.Named(Seq("v" -> "v")), jsonCol = Some("value"))
    val bad = s.createDataset(Seq("""{"v":"way too long for varchar(3)"}"""))(
      org.apache.spark.sql.Encoders.STRING).toDF("value")
    sink(bad, 0L) // must not throw
    val good = s.createDataset(Seq("""{"v":"ok"}"""))(
      org.apache.spark.sql.Encoders.STRING).toDF("value")
    sink(good, 1L)
    assert(queryOne(url, "SELECT COUNT(*) FROM small")(_.getInt(1)) == 1)
  }

  test("Q7 harness: size-limited batched append equals direct totals") {
    val url = derby("q7")
    val c = DriverManager.getConnection(url)
    c.createStatement().execute(
      "CREATE TABLE scratch (event_id BIGINT, user_id BIGINT)")
    c.close()
    val events = Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id")).orderBy("event_id")
    // drive the sink path in size_limit=5 batches (reference batcher shape)
    val rows = events.collect()
    val sink = SqlSink.foreachBatch(url,
      "INSERT INTO scratch (event_id, user_id) VALUES (:event_id, :user_id)",
      SqlSink.Identity)
    import scala.jdk.CollectionConverters._
    rows.grouped(5).zipWithIndex.foreach { case (g, i) =>
      val b = spark.createDataFrame(g.toSeq.asJava, events.schema)
      sink(b, i.toLong)
    }
    val (cnt, sumId) = queryOne(url,
      "SELECT COUNT(*), SUM(event_id) FROM scratch")(r =>
      (r.getLong(1), r.getLong(2)))
    val expect = events.agg(count(lit(1)), sum(col("event_id"))).collect().head
    assert(cnt == expect.getLong(0))
    assert(sumId == expect.getLong(1))
  }
}
