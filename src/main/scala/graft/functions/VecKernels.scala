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
    * projection of `v` onto pseudo-random ±1 plane p, where plane p's
    * sign for dim j = parity of (j*2654435761 + p*40503 + seed).
    * Bit-exact with the former HOF formulation in VectorFunctions.
    */
  def hyperplane(v: ArrayData, nPlanes: Int, seed: Int): Long = {
    val n = v.numElements()
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      val c = p.toLong * 40503 + seed
      var proj = 0.0
      var j = 0
      while (j < n) {
        val x = v.getFloat(j).toDouble
        proj += (if ((j * 2654435761L + c) % 2 == 0) x else -x)
        j += 1
      }
      if (proj > 0) bits |= (1L << p)
      p += 1
    }
    bits
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
