package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns, backed by native
  * codegen'd Catalyst expressions ([[VecExpressions]] /[[VecKernels]]):
  * tight primitive loops inside whole-stage codegen, no per-element
  * boxing, no UDF serialization boundary.
  *
  * All arithmetic is promoted to Double before accumulation (matching
  * what an oracle engine does when handed a FLOAT[] list), and summation
  * is sequential left-to-right over the array — deterministic for a given
  * row regardless of partitioning.
  */
object VectorFunctions {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    column(FloatDot(expression(a), expression(b)))

  /** Σ vᵢ² in double precision. */
  def normSq(a: Column): Column = column(FloatNormSq(expression(a)))

  /** Cosine similarity: dot / (|a|·|b|). NULL-propagating; 0-vectors ⇒ NaN
    * (same as the naive formula — callers filter if needed).
    */
  def cosineSim(a: Column, b: Column): Column =
    column(FloatCosine(expression(a), expression(b)))

  /** Cosine from a precomputed dot and per-side norms — use when one
    * side is joined against many (norms computed once per row, not per
    * pair).
    */
  def cosineFromNorms(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / sqrt(normA * normB)

  /** L2 (Euclidean) distance in double precision. */
  def l2Dist(a: Column, b: Column): Column =
    column(FloatL2(expression(a), expression(b)))

  /** Sign-bit bucket for random-hyperplane LSH: for each hyperplane
    * (a fixed seeded pseudo-random ±1 pattern over dimensions), emit one
    * bit = (Σ signᵢ·vᵢ > 0). Packing `nPlanes` bits gives a bucket id;
    * near vectors collide with high probability. Deterministic: plane i's
    * sign for dim j = low bit of a murmur3-finalized 64-bit hash of
    * (i, j, seed) — see [[VecKernels.hyperplane]].
    */
  def hyperplaneBucket(v: Column, nPlanes: Int, seed: Int = 42): Column =
    column(FloatHyperplaneBucket(expression(v), nPlanes, seed))

  /** Exact-BIGINT JL sign projection to `outDim` values — one codegen
    * loop per row (see [[VecKernels.jlProject]]).
    */
  def jlProjectVec(v: Column, outDim: Int, scale: Long): Column =
    column(JlProjectVec(expression(v), outDim, scale))

  /** 1-bit sign quantization to a single BIGINT (bit i = v[i] >= 0,
    * first 64 dims) — the binary-quantization ANN code; Hamming distance
    * between two codes is `bit_count(a ^ b)`.
    */
  def signBits(v: Column): Column = column(SignPack64(expression(v)))

  /** Late-interaction MaxSim score (ColBERT shape): both vectors are
    * viewed as `m` token sub-vectors of `dsub` dims, each element
    * quantized to BIGINT at `scale`, and the score is
    * Σ_q max_d dot(qTok, dTok) in exact integer arithmetic — one
    * codegen loop per pair (see [[VecKernels.maxSim]]).
    */
  def maxSimQ(a: Column, b: Column, m: Int, dsub: Int,
      scale: Long = 1000L): Column =
    column(MaxSimQuant(expression(a), expression(b), m, dsub, scale))

  /** [[maxSimQ]]'s quantization stage alone (FLOAT[] → BIGINT[n]) —
    * apply once per stored vector, then score pairs with
    * [[maxSimPre]]: same result, ~6× cheaper per pair (no per-pair
    * re-rounding).
    */
  def quantizeVec(v: Column, n: Int, scale: Long = 1000L): Column =
    column(QuantizeVec(expression(v), n, scale))

  /** MaxSim over two [[quantizeVec]]-ed BIGINT[] vectors. */
  def maxSimPre(a: Column, b: Column, m: Int, dsub: Int): Column =
    column(MaxSimPre(expression(a), expression(b), m, dsub))
}
