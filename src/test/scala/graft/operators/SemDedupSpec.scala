package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables
import graft.functions.VectorFunctions.cosineSim

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf, "embeddings")

  test("planted exact duplicate is dropped; its lower-id twin survives") {
    val dup = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val withDup = emb.select(col("vec_id"), col("embedding")).unionAll(dup)
    val res = Similarity.semDedup(withDup, "vec_id", "embedding",
      threshold = 0.99, nClusters = 4).cache()
    val keepOf = res.select("vec_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepOf(0L) == 1L, "lower-id twin must survive")
    assert(keepOf(100000L) == 0L, "identical higher-id vector must drop")
    assert(res.count() == withDup.count(), "one verdict per input row")
  }

  test("precision: every dropped row has a same-cluster partner above t") {
    val res = Similarity.semDedup(emb, "vec_id", "embedding",
      threshold = 0.5, nClusters = 8).cache()
    // brute-force ALL pairs above threshold (ground truth, any cluster)
    val e = emb.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val f = emb.select(col("vec_id").as("b"), col("embedding").as("eb"))
    val truePartners = e.crossJoin(f)
      .filter(col("a") < col("b"))
      .filter(cosineSim(col("ea"), col("eb")) >= 0.5)
      .select(col("b")).distinct()
      .collect().map(_.getLong(0)).toSet
    val dropped = res.filter(col("keep") === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // within-cluster pairs are a subset of all pairs: perfect precision
    assert(dropped.subsetOf(truePartners),
      s"false drops: ${dropped.diff(truePartners)}")
  }

  test("deterministic under repartitioning") {
    val a = Similarity.semDedup(emb, "vec_id", "embedding", 0.5, 8)
      .collect().map(_.toString).sorted.toSeq
    val b = Similarity.semDedup(emb.repartition(7), "vec_id", "embedding", 0.5, 8)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
