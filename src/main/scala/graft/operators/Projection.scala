package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding dimensionality reduction — the two standard tools of a
  * large-scale training-data pipeline, both built so their arithmetic
  * is EXACT BIGINT and therefore cross-engine certifiable (the same
  * fixed-point design as [[PageRank]] / [[Outliers]]):
  *
  *   - [[jlProject]]: Johnson–Lindenstrauss random projection with a
  *     deterministic ±1 sign matrix derived from (i, j) by pure integer
  *     arithmetic — no stored matrix, no RNG state; any engine that can
  *     multiply and mod reproduces the projection bit-for-bit. This is
  *     the "sparse/sign random projection" of Achlioptas (2003): E[‖Px‖²]
  *     preserves ‖x‖² with distortion O(1/√r), and the projection of a
  *     100 TB corpus is a single narrow codegen pass (no shuffle, no
  *     broadcast — the matrix is a formula).
  *
  *   - [[pcaComponents]] / [[pcaProject]]: principal components via the
  *     classic two-phase shape for tall-skinny data — ONE distributed
  *     pass accumulates the exact d×d Gram matrix and column sums in
  *     integer fixed point (d = embedding dim, so the aggregate is
  *     d²·8 bytes ≈ 32 KB for d=64 — driver-trivial even when the rows
  *     are petabytes), then a deterministic cyclic Jacobi eigensolver
  *     on the driver diagonalizes the d×d covariance. The eigensolve
  *     costs O(d³) independent of corpus size; all corpus-scale work is
  *     the one mapPartitions pass whose output is O(partitions) rows
  *     (the same bounded-collect contract as [[Packing]]'s prefix-sum
  *     totals). Components are quantized to 1e6 fixed point so the
  *     persisted artifact round-trips exactly and projection under it
  *     is exact BIGINT — DuckDB re-executes the projection from the
  *     pinned artifact independently, certifying the apply path
  *     end-to-end (the [[Bpe]] merge-table pattern).
  *
  * Reference scope note: jcollado/rabbithole has no vector operators
  * (SURVEY §0) — these are part of the LLM-pipeline surface the new
  * engine adds on top of the reference's relay semantics.
  */
object Projection {

  /** Input quantization scale for JL (1e6: float32 has ~7 significant
    * digits in [-1, 1], so micro-units preserve full precision).
    */
  val JlScale = 1000000L

  /** Input quantization scale for the PCA Gram pass (1e3: milli-units
    * keep Σ vqᵢ·vqⱼ within BIGINT for ~1e12 rows at |v| ≤ ~30).
    */
  val PcaScale = 1000L

  /** Component quantization scale (unit eigenvectors, |w| ≤ 1). */
  val CompScale = 1000000L

  /** Project `vecCol` (array<float>) to `outDim` dimensions with the
    * deterministic sign matrix: out (idCol, j, p) where
    * p = Σᵢ sign(i,j) · round(v[i]·1e6), an exact BIGINT, and
    * sign(i,j) = 1 − 2·((i·73856093 + j·19349663 + i·j·83492791) mod
    * 1000000007 mod 2) — parity of an integer spatial-hash mix reduced
    * mod a large prime (the mod breaks the parity structure of the
    * linear terms — measured balance 49.7% over 64×16, column dot
    * products ≤ 4/64). Pure BIGINT arithmetic: any SQL engine
    * reproduces it exactly, and the DuckDB oracle does.
    *
    * Plan: one narrow per-row pass through the
    * [[graft.functions.VecKernels.jlProject]] codegen kernel (all
    * outDim outputs in one primitive loop, zero shuffle, zero
    * broadcast); the posexplode to (id, j) rows is output formatting,
    * not a join. The previous nested `transform(sequence, aggregate)`
    * formulation was result-identical but evaluated outDim·dim
    * INTERPRETED Catalyst lambdas per row (~1024 for 64→16) — 79 s at
    * sf0.1 vs sub-second for this kernel.
    */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int): DataFrame = {
    val proj = graft.functions.VectorFunctions.jlProjectVec(
      col(vecCol), outDim, JlScale)
    df.select(col(idCol), posexplode(proj))
      .select(col(idCol), col("pos").cast("long").as("j"),
        col("col").as("p"))
  }

  /** One distributed pass: per-partition exact integer (count, column
    * sums, upper-triangular Gram) over quantized vectors, merged with a
    * depth-2 `treeReduce` — executors combine √partitions-sized groups
    * first, so the driver receives O(√partitions) ~d²·8-byte tuples
    * instead of one per partition (a 100k-partition 100 TB scan would
    * otherwise land ~1.6 GB on the driver). Integer addition is
    * associative/commutative, so the merge order is irrelevant to the
    * exact result. Returns (n, s[d], g[d*(d+1)/2]) with g in row-major
    * upper-triangle order.
    */
  private[operators] def gramStats(df: DataFrame, vecCol: String)
      : (Long, Array[Long], Array[Long]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df.select(col(vecCol).cast(ArrayType(FloatType)))
      .as[Array[Float]]
      .mapPartitions { it =>
        var n = 0L
        var s: Array[Long] = null
        var g: Array[Long] = null
        it.foreach { v =>
          val d = v.length
          if (s == null) { s = new Array[Long](d); g = new Array[Long](d * (d + 1) / 2) }
          val vq = new Array[Long](d)
          var i = 0
          while (i < d) {
            vq(i) = math.round(v(i).toDouble * PcaScale); s(i) += vq(i); i += 1
          }
          var k = 0
          i = 0
          while (i < d) {
            var j = i
            while (j < d) { g(k) += vq(i) * vq(j); k += 1; j += 1 }
            i += 1
          }
          n += 1L
        }
        if (n == 0L) Iterator.empty
        else Iterator.single((n, s, g))
      }
      .rdd
    val merged =
      try parts.treeReduce({ case ((n1, s1, g1), (n2, s2, g2)) =>
        var i = 0
        while (i < s1.length) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < g1.length) { g1(i) += g2(i); i += 1 }
        (n1 + n2, s1, g1)
      }, depth = 2)
      catch { case _: UnsupportedOperationException =>
        throw new IllegalArgumentException("gramStats: empty input")
      }
    merged
  }

  /** Deterministic cyclic Jacobi eigensolver for a symmetric d×d
    * matrix: fixed (p, q) sweep order, fixed sweep count bound,
    * convergence on off-diagonal Frobenius mass. Returns
    * (eigenvalues, eigenvectors as rows), both unsorted.
    */
  private[operators] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var sum = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { sum += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      sum
    }
    var sweep = 0
    while (sweep < maxSweeps && off() > 1e-20) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-30) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eig = Array.tabulate(d)(i => a(i)(i))
    val vecs = Array.tabulate(d)(c => Array.tabulate(d)(r => v(r)(c))) // row c = eigvec c
    (eig, vecs)
  }

  /** Incremental PCA: train components from a BASE corpus's Gram
    * statistics plus a DELTA's — the (n, Σv, Σvvᵀ) sufficient
    * statistics are exact BIGINTs and addition is associative, so the
    * merged model is BIT-IDENTICAL to a full retrain over base ∪
    * delta, at O(delta) distributed cost (the base corpus is never
    * re-read; its ~32 KB stats tuple is the persisted artifact). The
    * incremental-training primitive the streaming ingest loop needs:
    * each drop adds its stats, the driver re-runs the d×d eigensolve.
    */
  def pcaComponentsIncremental(base: DataFrame, delta: DataFrame,
      vecCol: String, r: Int): DataFrame = {
    val (n1, s1, g1) = gramStats(base, vecCol)
    val (n2, s2, g2) = gramStats(delta, vecCol)
    require(s1.length == s2.length, "dim mismatch between base and delta")
    val s = Array.tabulate(s1.length)(i => s1(i) + s2(i))
    val g = Array.tabulate(g1.length)(i => g1(i) + g2(i))
    componentsFromStats(base.sparkSession, n1 + n2, s, g, r)
  }

  /** Top-`r` principal components of `vecCol`, as an exactly-persistable
    * fixed-point artifact: one row per (comp, i) with
    *   - `w`: eigenvector entry, quantized ·1e6 (BIGINT)
    *   - `mu`: column mean in PCA input units (Σ vqᵢ div n — BIGINT)
    *   - `eigval`: component variance in micro input-variance units
    * Components sort by descending eigenvalue; each eigenvector's sign
    * is canonicalized (largest-|entry| coordinate positive, lowest
    * index on ties) so the artifact is a pure function of the data.
    */
  def pcaComponents(df: DataFrame, vecCol: String, r: Int): DataFrame = {
    val (n, s, g) = gramStats(df, vecCol)
    componentsFromStats(df.sparkSession, n, s, g, r)
  }

  /** Deterministic eigensolve + artifact build from exact integer
    * sufficient statistics — shared by [[pcaComponents]] (one-shot)
    * and [[pcaComponentsIncremental]] (merged base + delta stats).
    */
  private def componentsFromStats(spark: SparkSession, n: Long,
      s: Array[Long], g: Array[Long], r: Int): DataFrame = {
    val d = s.length
    require(r <= d, s"pcaComponents: r=$r > dim=$d")
    // covariance from the exact integer stats (deterministic doubles):
    // C[i][j] = G[i][j]/n − (s[i]/n)(s[j]/n), in (input·scale)² units
    val c = Array.ofDim[Double](d, d)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val cij = g(k).toDouble / n - (s(i).toDouble / n) * (s(j).toDouble / n)
        c(i)(j) = cij; c(j)(i) = cij; k += 1; j += 1
      }
      i += 1
    }
    val (eig, vecs) = jacobiEigen(c)
    val order = (0 until d).sortBy(idx => (-eig(idx), idx)).take(r)
    val mu = Array.tabulate(d)(idx => s(idx) / n) // BIGINT div — truncating, deterministic
    val rows = order.zipWithIndex.flatMap { case (ei, comp) =>
      val w0 = vecs(ei)
      // canonical sign: the largest-|w| entry (lowest index on ties) > 0
      var best = 0
      var bi = 1
      while (bi < d) { if (math.abs(w0(bi)) > math.abs(w0(best)) + 1e-15) best = bi; bi += 1 }
      val flip = if (w0(best) < 0) -1.0 else 1.0
      val ev = math.round(math.max(eig(ei), 0.0)) // already in fixed-point² units
      (0 until d).map { idx =>
        Row(comp, idx, math.round(w0(idx) * flip * CompScale), mu(idx), ev)
      }
    }
    val schema = StructType(Seq(
      StructField("comp", IntegerType, nullable = false),
      StructField("i", IntegerType, nullable = false),
      StructField("w", LongType, nullable = false),
      StructField("mu", LongType, nullable = false),
      StructField("eigval", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Project rows onto persisted components: out (idCol, comp, p) with
    * p = Σᵢ (round(v[i]·1e3) − mu[i]) · w[comp][i] — exact BIGINT, so an
    * independent engine reading the same artifact computes identical
    * values. Plan: the r-row aggregated component table broadcasts; the
    * corpus side is a narrow r-way codegen expansion (no shuffle).
    */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
      components: DataFrame): DataFrame = {
    val comps = components
      .groupBy(col("comp"))
      .agg(
        transform(array_sort(collect_list(struct(col("i"), col("w")))),
          s => s.getField("w")).as("warr"),
        transform(array_sort(collect_list(struct(col("i"), col("mu")))),
          s => s.getField("mu")).as("muarr"))
    val vq = transform(col(vecCol),
      x => round(x.cast("double") * PcaScale).cast("long"))
    df.select(col(idCol), vq.as("__vq"))
      .crossJoin(broadcast(comps))
      .select(col(idCol), col("comp").cast("long").as("comp"),
        aggregate(sequence(lit(0), size(col("__vq")) - 1), lit(0L),
          (acc, i) => acc +
            (element_at(col("__vq"), i + 1) - element_at(col("muarr"), i + 1)) *
              element_at(col("warr"), i + 1)).as("p"))
  }
}
