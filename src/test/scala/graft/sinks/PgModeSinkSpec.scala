package graft.sinks

import java.sql.{DriverManager, SQLException}

import graft.SparkSpec

/** Runs the sink suites under PostgreSQL transaction semantics
  * ([[PgModeDriver]]): Derby only fails the statement on error, but
  * PostgreSQL — the reference's production target (setup.py:85) —
  * aborts the whole transaction, so any code path that issues another
  * statement after a failure without rolling back first passes on
  * Derby and breaks on pg. The idempotent sink's marker-conflict and
  * failure paths are exactly such code.
  */
class PgModeSinkSpec extends SparkSpec {
  PgModeDriver.register()
  private val url = PgModeDriver.Prefix + "pgidem"

  private def count(table: String): Int = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(s"SELECT COUNT(*) FROM $table")
      rs.next(); rs.getInt(1)
    } finally c.close()
  }

  test("pgmode emulation: errors abort the transaction until rollback") {
    val c = DriverManager.getConnection(url)
    try {
      c.setAutoCommit(false)
      val st = c.createStatement()
      st.execute("CREATE TABLE semantics_t (v INT NOT NULL PRIMARY KEY)")
      c.commit()
      st.execute("INSERT INTO semantics_t VALUES (1)")
      intercept[SQLException] { st.execute("INSERT INTO semantics_t VALUES (1)") }
      // aborted: even a perfectly valid statement must now fail 25P02
      val e = intercept[SQLException] { st.execute("INSERT INTO semantics_t VALUES (2)") }
      assert(e.getSQLState == "25P02")
      // COMMIT on an aborted txn rolls back (row 1 must be gone)
      c.commit()
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM semantics_t")
      rs.next()
      assert(rs.getInt(1) == 0, "commit on aborted txn must roll back")
      c.commit()
    } finally c.close()
  }

  test("replaying the same batchId writes nothing under pg semantics") {
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE tgt (v VARCHAR(10))")
    c.close()
    val s = spark
    val df = s.createDataset(Seq("""{"v":"x"}""", """{"v":"y"}"""))(
      org.apache.spark.sql.Encoders.STRING).toDF("value")
    val sink = SqlSink.idempotentForeachBatch(url,
      "INSERT INTO tgt (v) VALUES (:v)",
      SqlSink.Named(Seq("v" -> "v")), flowId = "f1", jsonCol = Some("value"))
    sink(df, 7L)
    assert(count("tgt") == 2)
    sink(df, 7L) // replay — must be a no-op
    assert(count("tgt") == 2)
    sink(df, 8L)
    assert(count("tgt") == 4)
  }

  test("failing batch rethrows and replays cleanly under pg semantics") {
    // the marker INSERT succeeds, then the row INSERT fails (no table):
    // under pg the txn is aborted — the sink must roll back BEFORE any
    // further statement and rethrow; the replay then writes everything
    val s = spark
    val df = s.createDataset((0 until 8).map(i => s"""{"v":"t$i"}"""))(
      org.apache.spark.sql.Encoders.STRING).toDF("value")
    val sink = SqlSink.idempotentForeachBatch(url,
      "INSERT INTO tgt4 (v) VALUES (:v)",
      SqlSink.Named(Seq("v" -> "v")), flowId = "f4", jsonCol = Some("value"))
    intercept[Exception] { sink(df, 5L) }
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE tgt4 (v VARCHAR(10))")
    c.close()
    sink(df, 5L) // restart replays the batch
    assert(count("tgt4") == 8)
    sink(df, 5L) // further replay still a no-op
    assert(count("tgt4") == 8)
  }

  test("concurrent-attempt marker conflict is contained under pg semantics") {
    // attempt B's marker INSERT hits the PK with A's marker already
    // committed: under pg that aborts B's txn — the sink's immediate
    // rollback must contain it, leaving A's rows intact exactly once
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE tgt5 (v VARCHAR(10))")
    c.close()
    val s = spark
    val df = s.createDataset(Seq("""{"v":"a"}""", """{"v":"b"}"""))(
      org.apache.spark.sql.Encoders.STRING).toDF("value")
    val sink = SqlSink.idempotentForeachBatch(url,
      "INSERT INTO tgt5 (v) VALUES (:v)",
      SqlSink.Named(Seq("v" -> "v")), flowId = "f5", jsonCol = Some("value"))
    sink(df, 1L)
    sink(df, 1L) // markers already present on every partition
    assert(count("tgt5") == 2)
  }

  test("best-effort sink (R14 log-and-drop) also honors pg semantics") {
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE tgt6 (v VARCHAR(5))")
    c.close()
    val s = spark
    val ok = s.createDataset(Seq("""{"v":"ok"}"""))(
      org.apache.spark.sql.Encoders.STRING).toDF("value")
    val tooLong = s.createDataset(Seq("""{"v":"waytoolong"}"""))(
      org.apache.spark.sql.Encoders.STRING).toDF("value")
    val sink = SqlSink.foreachBatch(url,
      "INSERT INTO tgt6 (v) VALUES (:v)",
      SqlSink.Named(Seq("v" -> "v")), jsonCol = Some("value"))
    sink(ok, 1L)
    sink(tooLong, 2L) // fails mid-txn; dropped, pipeline continues
    sink(ok, 3L)
    assert(count("tgt6") == 2)
  }
}
