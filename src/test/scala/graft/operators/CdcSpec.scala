package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df(schema: String, rows: Row*) =
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))

  private lazy val snapshot = df("k BIGINT, v DOUBLE",
    Row(1L, 10.0), Row(2L, 20.0), Row(3L, 30.0), Row(4L, 40.0))

  test("applyLog: upsert, delete, insert-unseen, untouched pass-through") {
    val log = df("k BIGINT, ts BIGINT, op STRING, v DOUBLE",
      Row(1L, 5L, "U", 11.0),   // update existing
      Row(2L, 5L, "D", 0.0),    // delete existing
      Row(9L, 5L, "I", 90.0))   // insert unseen key
    val got = Cdc.applyLog(snapshot, log, "k", "ts", "op", Seq("v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq(
      (1L, 11.0), (3L, 30.0), (4L, 40.0), (9L, 90.0)))
  }

  test("applyLog: latest entry per key wins; replay is idempotent") {
    val log = df("k BIGINT, ts BIGINT, op STRING, v DOUBLE",
      Row(1L, 1L, "U", 100.0),  // superseded by ts=3
      Row(1L, 3L, "U", 111.0),
      Row(2L, 1L, "D", 0.0),    // superseded: delete then re-insert
      Row(2L, 2L, "I", 22.0))
    val once = Cdc.applyLog(snapshot, log, "k", "ts", "op", Seq("v"))
    val twice = Cdc.applyLog(once, log, "k", "ts", "op", Seq("v"))
    val want = Seq((1L, 111.0), (2L, 22.0), (3L, 30.0), (4L, 40.0))
    assert(once.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == want)
    assert(twice.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == want)
  }

  test("applyLog: same-ts entries resolve by the (op, attrs) total order") {
    // two entries at ts=5 for key 1: ('U', 50.0) > ('D', 0.0) because
    // 'U' > 'D' in the struct order — deterministic on any engine
    val log = df("k BIGINT, ts BIGINT, op STRING, v DOUBLE",
      Row(1L, 5L, "D", 0.0), Row(1L, 5L, "U", 50.0))
    val got = Cdc.applyLog(snapshot, log, "k", "ts", "op", Seq("v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.head == ((1L, 50.0)))
  }

  test("snapshotDiff: identical snapshots diff empty; edits localize to their bucket") {
    val docs = graft.engine.Tables(spark, sf, "documents")
    assert(Cdc.snapshotDiff(docs, docs, "doc_id", "text", 64).count() == 0)
    // one edited row -> exactly its bucket, counts equal
    val edited = docs.withColumn("text",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("doc_id") === 130,
        "changed").otherwise(org.apache.spark.sql.functions.col("text")))
    val e = Cdc.snapshotDiff(docs, edited, "doc_id", "text", 64).collect()
    assert(e.length == 1 && e.head.getLong(0) == 130 / 64)
    assert(e.head.getLong(1) == e.head.getLong(2)) // edit, not add/drop
    // one dropped row -> its bucket with n2 = n1 - 1
    val dropped = docs.filter(
      org.apache.spark.sql.functions.col("doc_id") =!= 130)
    val dr = Cdc.snapshotDiff(docs, dropped, "doc_id", "text", 64).collect()
    assert(dr.length == 1 && dr.head.getLong(0) == 130 / 64)
    assert(dr.head.getLong(2) == dr.head.getLong(1) - 1)
  }

  test("snapshotRowDiff: bucket-pruned rows equal the global row diff") {
    import org.apache.spark.sql.functions._
    val docs = graft.engine.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    // v2: drop 130, edit 131, add 900130
    val v2 = docs.filter(col("doc_id") =!= 130)
      .withColumn("text", when(col("doc_id") === 131,
        concat(col("text"), lit(" edit"))).otherwise(col("text")))
      .unionAll(docs.filter(col("doc_id") === 17)
        .select((col("doc_id") + 900113).as("doc_id"), col("text")))
    val got = Cdc.snapshotRowDiff(docs, v2, "doc_id", "text", 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(130L -> "deleted", 131L -> "edited",
      900130L -> "added"))
    // identity: no flagged buckets, no rows, no work
    assert(Cdc.snapshotRowDiff(docs, docs, "doc_id", "text", 64).count() == 0)
  }
}
