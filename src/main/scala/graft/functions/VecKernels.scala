package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight-loop float-vector kernels over Catalyst ArrayData — called
  * from both interpreted eval and generated code (no per-element
  * boxing, no lambda-function plumbing). Doubles for accumulation.
  */
object VecKernels {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i); i += 1 }
    s
  }

  /** Bit-exact twin of the SQL idiom `aggregate(zip_with(a, b,
    * (x, y) -> x * y), 0D, (s, x) -> s + x)`: each product is computed
    * in FLOAT (rounded, exactly as zip_with's float×float multiply
    * evaluates) and only the accumulation widens to double. [[dot]]'s
    * all-double products are ~1 ulp more accurate — which is precisely
    * why an optimizer rewrite of user SQL must use THIS kernel: the
    * rewrite may never change a query's observable result.
    */
  def dotF32(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += (a.getFloat(i) * b.getFloat(i)).toDouble; i += 1 }
    s
  }

  def normSq(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double =
    dot(a, b) / math.sqrt(normSq(a) * normSq(b))

  /** Random-hyperplane LSH bucket: bit p of the result = sign of the
    * projection of `v` onto pseudo-random ±1 plane p. The plane sign for
    * dim j comes from a murmur3-style 64-bit finalizer over (j, p, seed)
    * so each plane is an independent random ±1 pattern. (The previous
    * formulation took the raw parity of a sum of odd multiples, which
    * collapsed every plane to one of two alternating patterns — buckets
    * took ≤4 distinct values and LSH degenerated to brute force.)
    */
  def hyperplane(v: ArrayData, nPlanes: Int, seed: Int): Long = {
    val n = v.numElements()
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      val c = p.toLong * 0xC2B2AE3D27D4EB4FL + seed
      var proj = 0.0
      var j = 0
      while (j < n) {
        var h = j * 0x9E3779B97F4A7C15L + c
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        val x = v.getFloat(j).toDouble
        proj += (if ((h & 1L) == 0L) x else -x)
        j += 1
      }
      if (proj > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Count of common elements of two SORTED BIGINT arrays (merge scan).
    * Used for exact set-intersection verification of candidate pairs —
    * O(|a|+|b|) per pair with no join explosion.
    */
  def sortedIntersect(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Fraction of positions where two equal-length BIGINT arrays agree —
    * the MinHash signature-similarity estimator, as one codegen kernel
    * instead of N per-column comparisons.
    */
  def agreeFrac(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }

  /** 64-bit SimHash over a token array, one pass, no shuffle: per
    * token, xxhash64 its UTF-8 bytes (seed 42, same family as Spark's
    * xxhash64); per bit, count +1/-1 by the hash's bit value; result
    * bit = sign of the count. Equivalent to the explode->groupBy
    * formulation but runs as a per-row kernel — at corpus scale this
    * removes a full tokenized-corpus shuffle.
    */
  def simHash64(words: ArrayData): Long = {
    val n = words.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null && w.numBytes() > 0) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  /** Johnson–Lindenstrauss sign projection of a FLOAT[] vector to
    * `outDim` exact-BIGINT outputs in ONE per-row primitive loop:
    *   out[j] = Σᵢ sign(i,j) · round(v[i]·scale)
    * with sign(i,j) = 1 − 2·((i·73856093 + j·19349663 + i·j·83492791)
    * mod 1000000007 mod 2) — the identical integer formula the DuckDB
    * oracle re-executes. Rounding replicates Spark's `round(double)`
    * bit-for-bit (BigDecimal.valueOf + HALF_UP, NaN/Inf passthrough,
    * then the non-ANSI double→long cast), so this kernel is
    * result-identical to the `transform(sequence(...), aggregate(...))`
    * Catalyst formulation it replaces — which evaluated ~outDim·dim
    * interpreted lambdas per row (79 s at sf0.1; this loop is the same
    * arithmetic inside whole-stage codegen).
    */
  def jlProject(v: ArrayData, outDim: Int, scale: Long): ArrayData = {
    val n = v.numElements()
    val vq = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = v.getFloat(i).toDouble * scale
      val r =
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
        else java.math.BigDecimal.valueOf(d)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      vq(i) = r.toLong
      i += 1
    }
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      var s = 0L
      i = 0
      while (i < n) {
        val mix = (i.toLong * 73856093L + j.toLong * 19349663L +
          i.toLong * j.toLong * 83492791L) % 1000000007L
        s += (1L - 2L * (mix & 1L)) * vq(i)
        i += 1
      }
      out(j) = s
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** 1-bit sign quantization of a FLOAT[] vector: bit i of the result =
    * (v[i] >= 0), for the first min(64, dim) dimensions. One Long per
    * vector — a 32x bandwidth cut vs float32 at dim 64 — whose pairwise
    * Hamming distance (bit_count of the XOR) is the standard binary-
    * quantization ANN candidate metric (sign agreement ~ cosine angle).
    */
  def signPack(v: ArrayData): Long = {
    val n = math.min(v.numElements(), 64)
    var bits = 0L
    var i = 0
    while (i < n) { if (v.getFloat(i) >= 0f) bits |= (1L << i); i += 1 }
    bits
  }

  /** Late-interaction MaxSim (the ColBERT scoring shape) over two
    * FLOAT[] vectors viewed as `m` token sub-vectors of `dsub` dims:
    *   score = Σ_{qi<m} max_{dj<m} dot(qTok_qi, dTok_dj)
    * Every element is first quantized to BIGINT with the identical
    * HALF_UP rounding [[jlProject]] uses (and the DuckDB oracle
    * re-executes), so the token dots — and therefore the score — are
    * exact integer arithmetic: bit-identical on any engine, any
    * summation order. One per-row primitive loop (m²·dsub multiplies)
    * inside whole-stage codegen; the HOF formulation would evaluate
    * m²·dsub interpreted lambdas per row (the q167 failure mode).
    */
  def maxSim(a: ArrayData, b: ArrayData, m: Int, dsub: Int,
      scale: Long): Long = {
    val n = m * dsub
    val qa = quantArray(a, n, scale); val qb = quantArray(b, n, scale)
    maxSimLong(qa, qb, m, dsub)
  }

  private def quantArray(v: ArrayData, n: Int, scale: Long): Array[Long] = {
    val q = new Array[Long](n)
    val len = math.min(v.numElements(), n)
    var i = 0
    while (i < len) {
      val d = v.getFloat(i).toDouble * scale
      val r =
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
        else java.math.BigDecimal.valueOf(d)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      q(i) = r.toLong
      i += 1
    }
    q
  }

  /** [[maxSim]]'s quantization stage alone: FLOAT[] → BIGINT[n]
    * (round(x·scale) HALF_UP, zero-padded/truncated to n). Quantize
    * each vector ONCE at rest, then score pairs with [[maxSimPre]] —
    * the per-pair cost drops to pure long multiplies (the one-shot
    * [[maxSim]] re-rounds both sides on every pair: measured ~6× the
    * cost at 20× sf0.1).
    */
  def quantizeVec(v: ArrayData, n: Int, scale: Long): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(quantArray(v, n, scale))

  /** MaxSim over two ALREADY-QUANTIZED BIGINT[] vectors (see
    * [[quantizeVec]]) — result-identical to [[maxSim]] on the
    * pre-quantization floats.
    */
  def maxSimPre(a: ArrayData, b: ArrayData, m: Int, dsub: Int): Long = {
    val n = m * dsub
    val qa = new Array[Long](n); val qb = new Array[Long](n)
    var i = 0
    val la = math.min(a.numElements(), n)
    while (i < la) { qa(i) = a.getLong(i); i += 1 }
    i = 0
    val lb = math.min(b.numElements(), n)
    while (i < lb) { qb(i) = b.getLong(i); i += 1 }
    maxSimLong(qa, qb, m, dsub)
  }

  private def maxSimLong(qa: Array[Long], qb: Array[Long],
      m: Int, dsub: Int): Long = {
    var score = 0L
    var qi = 0
    while (qi < m) {
      var best = Long.MinValue
      var dj = 0
      while (dj < m) {
        var dp = 0L
        var p = 0
        while (p < dsub) { dp += qa(qi * dsub + p) * qb(dj * dsub + p); p += 1 }
        if (dp > best) best = dp
        dj += 1
      }
      score += best
      qi += 1
    }
    score
  }

  def l2(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i); s += d * d; i += 1
    }
    math.sqrt(s)
  }
}
