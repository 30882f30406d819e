package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class GraphAnnSpec extends SparkSpec {
  private lazy val emb = Tables(spark, sf, "embeddings").cache()

  private lazy val builtDir = {
    val dir = java.nio.file.Files.createTempDirectory("gann-spec-")
      .toString
    GraphAnn.graphIndex(emb, "vec_id", "embedding").write(dir)
    dir
  }

  test("graph index shape: bounded out-degree, every node present, one entry per cell") {
    val idx = GraphAnn.read(spark, builtDir)
    val n = emb.count()
    assert(idx.adj.count() == n, "every corpus vector must have an adjacency row")
    val maxDeg = idx.adj.select(max(size(col("nbrs")))).collect()(0).getInt(0)
    assert(maxDeg <= 12, s"out-degree cap violated: $maxDeg")
    val entries = idx.entries.count()
    assert(entries >= 1 && entries <= 16,
      s"entry layer must be one per cell, got $entries")
    // entry ids must be real corpus ids
    assert(idx.entries.join(idx.adj, Seq("cid"), "left_anti").count() == 0)
  }

  test("graphSearch recall@10 vs brute force >= 0.9") {
    val queries = emb.filter(col("vec_id") < 30)
    val exact = Similarity.bruteForceTopK(queries, emb,
        "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = GraphAnn.read(spark, builtDir)
    val approx = GraphAnn.graphSearch(idx, queries,
        "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"graph-ANN recall@10 $recall < 0.9")
  }

  test("persisted graph index: read-back search equals in-memory search") {
    val queries = emb.filter(col("vec_id") < 10)
    val inMem = GraphAnn.graphSearch(
        GraphAnn.graphIndex(emb, "vec_id", "embedding"), queries,
        "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSet
    val fromDisk = GraphAnn.graphSearch(GraphAnn.read(spark, builtDir),
        queries, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSet
    assert(fromDisk == inMem,
      "search over the persisted graph diverged from the in-memory one")
  }

  test("search returns k ranked rows per query, no self matches, sims in range") {
    val idx = GraphAnn.read(spark, builtDir)
    val rows = GraphAnn.graphSearch(idx,
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3)
      .collect()
    assert(rows.length == 15, s"expected 5*3 rows, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(0) != r.getLong(1), "self match surfaced")
      val s = r.getDouble(2)
      assert(s >= -1.0001 && s <= 1.0001, s"cosine out of range: $s")
    }
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.values.forall(_.map(_.getLong(3)).sorted.sameElements(
      Array(1L, 2L, 3L))), "ranks must be 1..k per query")
  }
}
