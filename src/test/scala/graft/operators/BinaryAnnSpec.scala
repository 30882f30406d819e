package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class BinaryAnnSpec extends SparkSpec {
  private lazy val emb = Tables(spark, sf, "embeddings").cache()

  test("signBits packs the sign pattern of the first 64 dims") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 0.0f, -0.5f)),   // bits: 1,0,1,0 -> 0b0101
      (2L, Array.fill(64)(-1.0f)),             // all negative -> 0
      (3L, Array.fill(64)(1.0f))               // all positive -> -1 (64 ones)
    ).toDF("id", "v")
    val got = df.select(col("id"),
        graft.functions.VectorFunctions.signBits(col("v")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 5L)
    assert(got(2L) == 0L)
    assert(got(3L) == -1L) // 64 set bits = two's-complement -1
  }

  test("binaryTopK: k rows per query, self excluded, deterministic") {
    val q = emb.filter(col("vec_id") < 10)
    val r1 = Similarity.binaryTopK(q, emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(r1.length == 30) // 10 queries x 3
    assert(r1.forall { case (qid, cid, _) => qid != cid })
    val r2 = Similarity.binaryTopK(q, emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(r1.toSet == r2.toSet) // pure function of the data
  }

  test("binaryTopK recall vs exact brute force is reasonable") {
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.binaryTopK(q, emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // 1-bit codes on near-isotropic synthetic data: a loose floor — the
    // point is the Hamming cut beats random (random recall@3/500 ~ 2%)
    assert(recall >= 0.2, s"recall $recall too low")
  }
}
