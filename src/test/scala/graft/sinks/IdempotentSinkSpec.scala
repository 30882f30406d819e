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
