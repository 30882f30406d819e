package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  private lazy val vecs = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    spark.createDataFrame(Seq(
      Row(1L, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
      Row(2L, Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),   // orthogonal
      Row(3L, Seq(2f, 2f, 2f), Seq(1f, 1f, 1f))    // parallel
    ).asJava, schema)
  }

  private def one(id: Long, c: org.apache.spark.sql.Column): Double =
    vecs.filter(col("id") === id).select(c).collect().head.getDouble(0)

  test("dot product") { assert(one(1L, dot(col("a"), col("b"))) == 32.0) }

  test("norm and l2") {
    assert(one(2L, normSq(col("a"))) == 1.0)
    assert(math.abs(one(2L, l2Dist(col("a"), col("b"))) - math.sqrt(2)) < 1e-12)
  }

  test("cosine: orthogonal=0, parallel=1") {
    assert(one(2L, cosineSim(col("a"), col("b"))) == 0.0)
    assert(math.abs(one(3L, cosineSim(col("a"), col("b"))) - 1.0) < 1e-12)
  }

  test("SQL extension functions match the Column API (sign_bits, simhash64, sorted_intersect, agree_frac)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, -2.0f, 0.5f), Seq("alpha", "beta"),
      Seq(1L, 3L, 7L), Seq(2L, 3L, 9L))).toDF("v", "ws", "sa", "sb")
    df.createOrReplaceTempView("vf_sql_parity")
    val viaSql = spark.sql(
      """SELECT sign_bits(v) AS sb64, simhash64(ws) AS sh,
        |sorted_intersect(sa, sb) AS si, agree_frac(sa, sb) AS af
        |FROM vf_sql_parity""".stripMargin).collect().head
    val viaCol = df.select(
        signBits(col("v")),
        org.apache.spark.sql.GraftBridge.column(SimHash64(
          org.apache.spark.sql.GraftBridge.expression(col("ws")))),
        org.apache.spark.sql.GraftBridge.column(SortedLongIntersect(
          org.apache.spark.sql.GraftBridge.expression(col("sa")),
          org.apache.spark.sql.GraftBridge.expression(col("sb")))),
        org.apache.spark.sql.GraftBridge.column(LongArrayAgreeFrac(
          org.apache.spark.sql.GraftBridge.expression(col("sa")),
          org.apache.spark.sql.GraftBridge.expression(col("sb")))))
      .collect().head
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getLong(1) == viaCol.getLong(1))
    assert(viaSql.getLong(2) == viaCol.getLong(2) && viaSql.getLong(2) == 1L)
    assert(viaSql.getDouble(3) == viaCol.getDouble(3))
  }

  test("hyperplane bucket is deterministic and groups parallel vectors") {
    val b1 = one(3L, hyperplaneBucket(col("a"), 8).cast("double"))
    val b2 = one(3L, hyperplaneBucket(col("b"), 8).cast("double"))
    assert(b1 == b2) // scaled copies project to identical sign patterns
    val again = one(3L, hyperplaneBucket(col("a"), 8).cast("double"))
    assert(b1 == again)
  }
}
