package graft.sinks

import java.sql.DriverManager

import graft.SparkSpec

/** Exactly-once upgrade (SURVEY §7.4): a replayed micro-batch (same
  * batchId — what Spark does after restart with an uncommitted batch)
  * must not double-write.
  */
class IdempotentSinkSpec extends SparkSpec {
  private val url = "jdbc:derby:memory:idem;create=true"

  private def count(table: String): Int = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(s"SELECT COUNT(*) FROM $table")
      rs.next(); rs.getInt(1)
    } finally c.close()
  }

  test("replaying the same batchId writes nothing; new batchIds append") {
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
    sink(df, 8L) // genuinely new batch
    assert(count("tgt") == 4)
  }

  test("replay with different source partitioning still writes nothing") {
    // pid must be a pure function of row values: the sink re-partitions
    // deterministically, so a restart that re-splits the batch cannot
    // double-write or drop a subset
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE tgt3 (v VARCHAR(10))")
    c.close()
    val s = spark
    val df = s.createDataset((0 until 20).map(i => s"""{"v":"r$i"}"""))(
      org.apache.spark.sql.Encoders.STRING).toDF("value")
    val sink = SqlSink.idempotentForeachBatch(url,
      "INSERT INTO tgt3 (v) VALUES (:v)",
      SqlSink.Named(Seq("v" -> "v")), flowId = "f3", jsonCol = Some("value"))
    sink(df.repartition(3), 1L)
    assert(count("tgt3") == 20)
    sink(df.repartition(11), 1L) // replay, differently partitioned
    assert(count("tgt3") == 20)
  }

  test("marker table primary key rejects a duplicate committer") {
    SqlSink.ensureMarkerTable(url)
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute(s"INSERT INTO ${SqlSink.MarkerTable} VALUES ('pk_t', 1, 0)")
      intercept[java.sql.SQLException] {
        st.execute(s"INSERT INTO ${SqlSink.MarkerTable} VALUES ('pk_t', 1, 0)")
      }
    } finally c.close()
  }

  test("a failing batch rethrows; the replay writes everything, once") {
    // transient-failure contract: the sink must FAIL the micro-batch
    // (so the checkpoint does not advance), roll back its markers, and
    // let the replay write the full batch — never log-and-drop
    val s = spark
    val df = s.createDataset((0 until 8).map(i => s"""{"v":"t$i"}"""))(
      org.apache.spark.sql.Encoders.STRING).toDF("value")
    val sink = SqlSink.idempotentForeachBatch(url,
      "INSERT INTO tgt4 (v) VALUES (:v)",
      SqlSink.Named(Seq("v" -> "v")), flowId = "f4", jsonCol = Some("value"))
    // the target table does not exist yet -> every partition task throws
    // after its marker INSERT; the rollback-before-close path must
    // release the markers and the sink must rethrow
    intercept[Exception] { sink(df, 5L) }
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE tgt4 (v VARCHAR(10))")
    c.close()
    // "restart": same batchId replays once the transient condition clears
    sink(df, 5L)
    assert(count("tgt4") == 8)
    sink(df, 5L) // and a second replay is still a no-op
    assert(count("tgt4") == 8)
  }

  test("flows are isolated by flowId") {
    val c = DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE tgt2 (v VARCHAR(10))")
    c.close()
    val s = spark
    val df = s.createDataset(Seq("""{"v":"z"}"""))(
      org.apache.spark.sql.Encoders.STRING).toDF("value")
    def sink(flow: String) = SqlSink.idempotentForeachBatch(url,
      "INSERT INTO tgt2 (v) VALUES (:v)",
      SqlSink.Named(Seq("v" -> "v")), flowId = flow, jsonCol = Some("value"))
    sink("fa")(df, 1L)
    sink("fb")(df, 1L) // same batchId, different flow => both write
    assert(count("tgt2") == 2)
  }
}
