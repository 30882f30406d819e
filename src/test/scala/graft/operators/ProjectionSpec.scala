package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class ProjectionSpec extends SparkSpec {
  private lazy val emb = Tables(spark, sf, "embeddings").cache()

  // ---------------- JL random projection ----------------

  test("jlProject: 16 output dims per row, exact BIGINT, deterministic") {
    val n = emb.count()
    val r1 = Projection.jlProject(emb, "vec_id", "embedding", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(r1.length == n * 16)
    val r2 = Projection.jlProject(emb, "vec_id", "embedding", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(r1.toSet == r2.toSet) // pure function of the data
  }

  test("jlProject: sign matrix is balanced per output dim") {
    // re-derive the formula sign independently of the Spark expression
    def sign(i: Long, j: Long): Long =
      1L - 2L * (((i * 73856093L + j * 19349663L + i * j * 83492791L)
        % 1000000007L) % 2L)
    for (j <- 0 until 16) {
      val ones = (0 until 64).count(i => sign(i.toLong, j.toLong) == 1L)
      assert(ones >= 24 && ones <= 40, s"dim $j unbalanced: $ones/64 positive")
    }
  }

  test("jlProject: preserves pairwise squared distances on average (JL property)") {
    val rDim = 16
    val vecs = emb.orderBy("vec_id").limit(20)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val proj = Projection.jlProject(emb, "vec_id", "embedding", rDim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3.toDouble / Projection.JlScale)
      }
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      ai <- vecs.indices; bi <- vecs.indices if ai < bi
      a = vecs(ai); b = vecs(bi)
      orig = d2(a._2.map(_.toDouble), b._2.map(_.toDouble)) if orig > 1e-9
    } yield d2(proj(a._1).toArray, proj(b._1).toArray) / rDim / orig
    // E[ratio] = 1 with per-pair deviation O(1/sqrt(r)); the MEAN over
    // 190 pairs concentrates much tighter
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"mean distortion ratio $mean")
    // and no pathological pair (sign matrices can't collapse a
    // direction entirely at r=16 without astronomically bad luck)
    assert(ratios.forall(r => r > 0.05 && r < 5.0),
      s"extreme pair distortion: ${ratios.min} .. ${ratios.max}")
  }

  // ---------------- PCA ----------------

  private lazy val comps = Projection.pcaComponents(emb, "embedding", r = 8)
    .collect()
    .groupBy(_.getInt(0))
    .map { case (c, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      (c, sorted.map(_.getLong(2).toDouble / Projection.CompScale),
        sorted.head.getLong(4).toDouble)
    }
    .toSeq.sortBy(_._1)

  test("pcaComponentsIncremental: merged stats equal a full retrain exactly") {
    val emb = graft.engine.Tables(spark, sf, "embeddings")
    val base = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 300)
    val delta = emb.filter(org.apache.spark.sql.functions.col("vec_id") >= 300)
    val full = Projection.pcaComponents(emb, "embedding", 4)
      .collect().map(_.toString).sorted.toSeq
    val inc = Projection.pcaComponentsIncremental(base, delta, "embedding", 4)
      .collect().map(_.toString).sorted.toSeq
    // exact integer sufficient statistics: bit-identical, not just close
    assert(inc == full)
  }

  test("pcaComponents: eigenvectors are orthonormal after dequantization") {
    for ((ci, wi, _) <- comps; (cj, wj, _) <- comps if ci <= cj) {
      val dot = wi.zip(wj).map { case (a, b) => a * b }.sum
      val expect = if (ci == cj) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-3,
        s"comps $ci . $cj = $dot, expected $expect")
    }
  }

  test("pcaComponents: eigenvalues are sorted descending and nonnegative") {
    val evs = comps.map(_._3)
    assert(evs.forall(_ >= 0.0))
    assert(evs.sliding(2).forall(p => p.head >= p.last), evs.mkString(","))
  }

  test("pcaComponents: eigen residual ||Cw - λw|| is small") {
    // rebuild the covariance exactly as training does, from the same
    // integer stats
    val (n, s, g) = Projection.gramStats(emb, "embedding")
    val d = s.length
    val c = Array.ofDim[Double](d, d)
    var k = 0
    for (i <- 0 until d; j <- i until d) {
      val cij = g(k).toDouble / n - (s(i).toDouble / n) * (s(j).toDouble / n)
      c(i)(j) = cij; c(j)(i) = cij; k += 1
    }
    val lmax = comps.map(_._3).max.max(1.0)
    for ((ci, w, ev) <- comps) {
      val cw = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * w(j)).sum)
      val resid = math.sqrt(
        cw.zip(w).map { case (a, b) => (a - ev * b) * (a - ev * b) }.sum)
      // quantization of w contributes ~1e-6·d·λ; allow a loose margin
      assert(resid <= 1e-3 * lmax, s"comp $ci residual $resid (λmax $lmax)")
    }
  }

  test("pcaProject: per-component variance matches the eigenvalue") {
    val compDf = Projection.pcaComponents(emb, "embedding", r = 3)
    val proj = Projection.pcaProject(emb, "vec_id", "embedding", compDf)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val evByComp = comps.map(t => (t._1.toLong, t._3)).toMap
    for ((cmp, rows) <- proj) {
      val xs = rows.map(_._2.toDouble / Projection.CompScale) // back to input·1e3 units
      val mean = xs.sum / xs.size
      val v = xs.map(x => (x - mean) * (x - mean)).sum / xs.size
      val ev = evByComp(cmp)
      assert(ev == 0.0 || math.abs(v / ev - 1.0) < 0.05,
        s"comp $cmp: var(p)=$v eigval=$ev")
    }
  }
}
