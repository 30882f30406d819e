package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class SimilaritySpec extends SparkSpec {
  private lazy val emb = Tables(spark, sf, "embeddings").cache()

  test("bruteForceTopK returns k neighbors per query, ranked by cosine") {
    val r = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 3)
    val rows = r.collect()
    assert(rows.length == 15) // 5 queries x 3
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { g =>
      val sims = g.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.sliding(2).forall(p => p.head >= p.last)) // rank order
      assert(g.forall(x => x.getLong(0) != x.getLong(1)))   // self excluded
    }
  }

  test("ivfTopK recall vs brute force is reasonable") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 1)
      .filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        k = 1, nCentroids = 8, nProbe = 4, iters = 2)
      .filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("persisted IVF index: write + read-back search equals inline ivfTopK") {
    val queries = emb.filter(col("vec_id") < 20)
    val inline = Similarity.ivfTopK(queries, emb, "vec_id", "embedding",
        k = 3, nCentroids = 8, nProbe = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("ivf-spec-").toString
    Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2).write(dir)
    val idx = Similarity.ivfIndexRead(spark, dir)
    // two batches against the SAME read-back artifact — no retrain
    val fromDisk = Similarity.ivfSearch(idx, queries,
        "vec_id", "embedding", k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(fromDisk == inline,
      "search over the persisted index diverged from inline train+search")
    val batch2 = Similarity.ivfSearch(idx,
        emb.filter(col("vec_id") >= 20 && col("vec_id") < 25),
        "vec_id", "embedding", k = 2, nProbe = 4)
    assert(batch2.count() == 10) // 5 queries x 2 — index reuse works
  }

  test("withTombstones: deletes never surface; full-probe search == brute force over survivors") {
    val tomb = emb.filter(col("vec_id") % 7 === 0)
    val tombIds = tomb.collect().map(_.getLong(0)).toSet
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2)
    val masked = Similarity.withTombstones(idx, tomb, "vec_id")
    val q = emb.filter(col("vec_id") < 10 && col("vec_id") % 7 =!= 0)
    val got = Similarity.ivfSearch(masked, q, "vec_id", "embedding",
        k = 3, nProbe = 8) // nProbe = nCentroids: every cell scanned
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.forall { case (_, cid, _) => !tombIds.contains(cid) },
      "a tombstoned vector surfaced in the results")
    // full-probe masked search must equal exact brute force over the
    // surviving corpus — the mask is a visibility cut, not an
    // approximation knob
    val exact = Similarity.bruteForceTopK(q,
        emb.filter(col("vec_id") % 7 =!= 0), "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.toSet == exact.toSet,
      "masked full-probe search diverged from brute force over survivors")
  }

  test("ivfAppend: frozen-centroid append equals bulk assignment of the union") {
    val a = emb.filter(col("vec_id") < 250)
    val b = emb.filter(col("vec_id") >= 250)
    val dir = java.nio.file.Files.createTempDirectory("ivf-append-").toString
    Similarity.ivfIndex(a, "vec_id", "embedding",
      nCentroids = 8, iters = 2).write(dir)
    val baseCount = spark.read.parquet(s"$dir/postings").count()
    val idx = Similarity.ivfAppend(spark, dir, b, "vec_id", "embedding")
    // every corpus row present exactly once after the append
    assert(idx.postings.count() == emb.count())
    assert(idx.postings.select("cid").distinct().count() == emb.count())
    assert(baseCount == a.count())
    // reference: bulk assignment of the UNION under the SAME frozen
    // centroids — append must be indistinguishable
    val centroids = spark.read.parquet(s"$dir/centroids")
    val bulk = Similarity.IvfIndex(centroids,
      Similarity.nearest1(
        emb.select(col("vec_id").as("cid"), col("embedding").as("cv"),
          graft.functions.VectorFunctions.normSq(col("embedding")).as("cn")),
        centroids, "cid", "cv", Seq("cv", "cn"), "bucket"))
    val q = emb.filter(col("vec_id") < 10)
    def run(i: Similarity.IvfIndex) =
      Similarity.ivfSearch(i, q, "vec_id", "embedding", k = 3, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(run(idx) == run(bulk))
    // appended rows landed in their nearest frozen cell
    val assignedB = idx.postings.join(bulk.postings
        .select(col("cid"), col("bucket").as("want")), "cid")
      .filter(col("bucket") =!= col("want")).count()
    assert(assignedB == 0)
  }

  test("int8TopK: high recall vs exact; rank order and self-exclusion hold") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.int8TopK(queries, emb, "vec_id", "embedding",
      k = 3, dim = 64, overfetch = 4).collect()
    val approx = quant.map(r => (r.getLong(0), r.getLong(1))).toSet
    // int8 quantization of 64-dim floats loses very little: the top-3
    // sets should nearly coincide with exact brute force
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall too low for scalar quantization")
    quant.groupBy(_.getLong(0)).values.foreach { g =>
      val sims = g.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.sliding(2).forall(p => p.head >= p.last)) // exact re-rank order
      assert(g.forall(x => x.getLong(0) != x.getLong(1)))   // self excluded
    }
  }

  test("int8TopK with full overfetch equals exact brute force") {
    // overfetch covering the whole corpus makes the candidate stage a
    // no-op: the exact re-rank must then reproduce bruteForceTopK
    // exactly (quantization can only cost recall, never mis-order)
    val queries = emb.filter(col("vec_id") < 5)
    val n = emb.count().toInt
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val quant = Similarity.int8TopK(queries, emb, "vec_id", "embedding",
        k = 2, dim = 64, overfetch = n / 2 + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(quant == exact)
  }

  test("hyperplane buckets are well-distributed, not degenerate") {
    // regression: the pre-fix sign hash collapsed every plane to one of
    // two alternating patterns, so 8-plane buckets took <= 4 distinct
    // values and LSH was secretly brute force
    import graft.functions.VectorFunctions.hyperplaneBucket
    val distinct = emb
      .select(hyperplaneBucket(col("embedding"), 8, seed = 0).as("b"))
      .distinct().count()
    assert(distinct > 64, s"only $distinct distinct buckets out of 256")
  }

  test("lshTopK recall vs brute force is reasonable") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 1)
      .filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(queries, emb, "vec_id", "embedding",
        k = 1, nPlanes = 8, tables = 8, probeRadius = 2)
      .filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low") // random 64-dim data is
    // a worst case for LSH; the contract here is "well above chance"
  }

  test("centroidOutliers ranks a planted far vector first in its label") {
    // plant a vector 100x the typical magnitude into label 0: it drags
    // the centroid a little but sits far from it — must be rn=1
    val planted = emb.filter(col("vec_id") === 0)
      .select(lit(900009L).as("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x * 100.0f).as("embedding"),
        lit(0).as("label"))
    val r = Similarity.centroidOutliers(emb.unionByName(planted),
        "vec_id", "embedding", "label", dim = 64, topK = 3)
      .collect()
    val lbl0 = r.filter(_.getInt(0) == 0)
    assert(lbl0.length == 3)
    assert(lbl0.head.getLong(1) == 900009L && lbl0.head.getLong(3) == 1L,
      s"planted outlier must rank first: ${lbl0.mkString(";")}")
    // every label produces exactly topK ranked rows
    assert(r.groupBy(_.getInt(0)).forall(_._2.length == 3))
  }
}
