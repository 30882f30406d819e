package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns, built entirely from
  * Catalyst higher-order functions (`zip_with` / `aggregate`) — no Scala
  * UDF, so Catalyst can still prune/push around these expressions and no
  * serialization boundary is introduced.
  *
  * All arithmetic is promoted to Double before accumulation (matching
  * what an oracle engine does when handed a FLOAT[] list), and summation
  * is sequential left-to-right over the array — deterministic for a given
  * row regardless of partitioning.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Σ vᵢ² in double precision. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  /** Cosine similarity: dot / (|a|·|b|). NULL-propagating; 0-vectors ⇒ NaN
    * (same as the naive formula — callers filter if needed).
    */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** L2 (Euclidean) distance in double precision. */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v))

  /** Sign-bit bucket for random-hyperplane LSH: for each hyperplane
    * (a fixed seeded pseudo-random ±1 pattern over dimensions), emit one
    * bit = (Σ signᵢ·vᵢ > 0). Packing `nPlanes` bits gives a bucket id;
    * near vectors collide with high probability. Deterministic: plane i's
    * sign for dim j = parity of a small integer hash of (i, j).
    */
  def hyperplaneBucket(v: Column, nPlanes: Int, seed: Int = 42): Column = {
    val bits = (0 until nPlanes).map { p =>
      // projection of v onto pseudo-random ±1 plane p
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, j) => {
          val h = pmod(j * lit(2654435761L) + lit(p * 40503 + seed), lit(2L))
          when(h === 0, x.cast("double")).otherwise(-x.cast("double"))
        }),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }
    bits.reduce(_ + _)
  }
}
