package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** The reference's projection contract (reference sql.py:110-215):
  * missing key ⇒ NULL, traversal into a scalar ⇒ NULL, residual
  * nesting ⇒ JSON string.
  */
class PathExtractSpec extends SparkSpec {
  private lazy val df = {
    val s = spark
    s.read.json(s.createDataset(Seq(
      """{"id":1,"message":"hello","meta":{"a":{"b":7},"tags":[1,2]}}""",
      """{"id":2,"message":"world","meta":{"a":{"b":8},"tags":[3]}}"""
    ))(org.apache.spark.sql.Encoders.STRING))
  }

  test("plain field") {
    val r = df.select(col("id"), PathExtract.fromRow(df, "message"))
      .orderBy("id").collect()
    assert(r.map(_.getString(1)).toSeq == Seq("hello", "world"))
  }

  test("nested path") {
    val r = df.select(PathExtract.fromRow(df, "meta.a.b").cast("long"))
      .orderBy(col("meta.a.b")).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(7L, 8L))
  }

  test("missing key yields NULL") {
    val r = df.select(PathExtract.fromRow(df, "meta.nope")).collect()
    assert(r.forall(_.isNullAt(0)))
    val r2 = df.select(PathExtract.fromRow(df, "absent_root")).collect()
    assert(r2.forall(_.isNullAt(0)))
  }

  test("traversal into a scalar yields NULL") {
    val r = df.select(PathExtract.fromRow(df, "message.deeper")).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("residual nesting serializes to JSON string") {
    val r = df.filter(col("id") === 1)
      .select(PathExtract.fromRow(df, "meta.a")).collect()
    assert(r.head.getString(0) == """{"b":7}""")
    val arr = df.filter(col("id") === 1)
      .select(PathExtract.fromRow(df, "meta.tags")).collect()
    assert(arr.head.getString(0) == """[1,2]""")
  }

  test("fromJson on a raw JSON string column matches the same rules") {
    val s = spark
    val raw = s.createDataset(Seq("""{"a":{"b":1},"s":"x"}"""))(
      org.apache.spark.sql.Encoders.STRING).toDF("j")
    def get(p: String): Row =
      raw.select(PathExtract.fromJson(col("j"), p)).collect().head
    assert(get("a.b").getString(0) == "1")
    assert(get("a").getString(0) == """{"b":1}""")
    assert(get("nope").isNullAt(0))
    assert(get("s.deeper").isNullAt(0))
  }

  test("list and dict mappers (reference sql.py:169-215)") {
    val lm = PathExtract.listMapper(df, Seq("id", "meta.a.b", "missing"))
    assert(lm.columns.toSeq == Seq("p0", "p1", "p2"))
    val row = lm.orderBy("p0").collect().head
    assert(row.getLong(0) == 1L && row.getLong(1) == 7L && row.isNullAt(2))
    val dm = PathExtract.dictMapper(df, Seq("x" -> "meta.a.b", "y" -> "message"))
    assert(dm.columns.toSeq == Seq("x", "y"))
    assert(dm.orderBy("x").collect().head.getString(1) == "hello")
  }
}
