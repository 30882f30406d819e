package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class IvfPqSpec extends SparkSpec {
  private lazy val emb = Tables(spark, sf, "embeddings").cache()

  test("ivfPqTopK recall@3 vs brute force is reasonable") {
    // same recall@k convention as PqSpec: these synthetic embeddings
    // are near-random (no low-dim cluster structure), the adversarial
    // case for PQ codebooks — 0.5 is the honest floor here
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding",
        k = 3, nCells = 8, m = 8, ksub = 32, nProbe = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("persisted IVF-PQ index: read-back search equals inline topK") {
    val queries = emb.filter(col("vec_id") < 20)
    val inline = Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding",
        k = 3, nCells = 8, m = 8, ksub = 16, nProbe = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-spec-").toString
    Similarity.ivfPqIndex(emb, "vec_id", "embedding",
      nCells = 8, m = 8, ksub = 16, iters = 2).write(dir)
    val idx = Similarity.ivfPqIndexRead(spark, dir)
    val fromDisk = Similarity.ivfPqSearch(idx, queries,
        "vec_id", "embedding", k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(fromDisk == inline,
      "search over the persisted index diverged from inline train+search")
    // second batch against the same artifact — index reuse
    val batch2 = Similarity.ivfPqSearch(idx,
        emb.filter(col("vec_id") >= 20 && col("vec_id") < 25),
        "vec_id", "embedding", k = 2, nProbe = 4)
    assert(batch2.count() == 10)
  }

  test("persisted codes are hive-partitioned by cell; probes prune partitions") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-dpp-").toString
    Similarity.ivfPqIndex(emb, "vec_id", "embedding",
      nCells = 8, m = 8, ksub = 16, iters = 2).write(dir)
    // layout: one bucket=<ctr>/ directory per cell
    val bucketDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(bucketDirs.length == 8, s"got ${bucketDirs.map(_.getName).toSeq}")
    // a probe-limited search must prune the codes scan to the probed
    // cells — dynamic partition pruning from the broadcast probe side
    // (file-level skipping: an unprobed cell costs zero I/O at 100 TB)
    val idx = Similarity.ivfPqIndexRead(spark, dir)
    val res = Similarity.ivfPqSearch(idx,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3,
      nProbe = 2)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the codes scan:\n$plan")
  }

  test("index shape: one codes row per vector, m codes each, true norms") {
    val idx = Similarity.ivfPqIndex(emb, "vec_id", "embedding",
      nCells = 4, m = 8, ksub = 16, iters = 1)
    val n = emb.count()
    assert(idx.codes.count() == n)
    assert(idx.codes.filter(size(col("codes")) =!= 8).count() == 0)
    // codes bucket values come from the coarse centroid set
    val cells = idx.centroids.select("ctr").collect().map(_.getLong(0)).toSet
    val used = idx.codes.select("bucket").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(used.subsetOf(cells))
    // cn is the TRUE vector norm (not the residual's): spot-check one
    val row = idx.codes.orderBy("cid").limit(1)
      .join(emb.withColumnRenamed("vec_id", "cid"), "cid")
      .select(col("cn"),
        aggregate(col("embedding"), lit(0.0d),
          (a, x) => a + x * x).as("truth"))
      .head()
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-3)
  }

  test("probing more cells is monotone: nProbe=nCells reaches exact IVF recall") {
    val queries = emb.filter(col("vec_id") < 10)
    val idx = Similarity.ivfPqIndex(emb, "vec_id", "embedding",
      nCells = 4, m = 8, ksub = 16, iters = 1)
    val all = Similarity.ivfPqSearch(idx, queries, "vec_id", "embedding",
      k = 3, nProbe = 4, overfetch = 16)
    // with every cell probed + wide overfetch the exact re-rank sees
    // essentially the whole corpus: top-1 must match brute force
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 1)
      .filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = all.filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.8, s"full-probe recall $recall")
  }
}
