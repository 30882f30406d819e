package graft.engine

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {
  test("vector functions are callable from plain SQL") {
    val r = spark.sql(
      """SELECT cos_sim(a, b) AS cs, vec_dot(a, b) AS d,
        |       vec_l2(a, b) AS l2, vec_norm_sq(a) AS n
        |FROM VALUES (array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS t(a, b)
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 0.0)
    assert(math.abs(r.getDouble(2) - math.sqrt(2)) < 1e-12)
    assert(r.getDouble(3) == 1.0)
  }

  test("SQL cos_sim matches the Column API on real embeddings") {
    Tables(spark, sf, "embeddings").createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      """SELECT ROUND(cos_sim(a.embedding, b.embedding), 6) AS s
        |FROM emb_ext a JOIN emb_ext b ON a.vec_id = 0 AND b.vec_id = 1
        |""".stripMargin).collect().head.getDouble(0)
    import org.apache.spark.sql.functions._
    val e = Tables(spark, sf, "embeddings")
    val viaApi = e.filter(col("vec_id") === 0)
      .crossJoin(e.filter(col("vec_id") === 1).select(col("embedding").as("e2")))
      .select(round(graft.functions.VectorFunctions.cosineSim(
        col("embedding"), col("e2")), 6))
      .collect().head.getDouble(0)
    assert(viaSql == viaApi)
  }
}
