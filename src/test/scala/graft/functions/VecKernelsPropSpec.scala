package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.catalyst.util.ArrayData

/** Property pins for the codegen kernels against naive reference
  * implementations — the kernels are the hot path of every similarity
  * scan, so a silent off-by-one in a loop bound would corrupt results
  * at any scale while still "running". Raw ScalaCheck generators
  * sampled with fixed seeds (scalatestplus bridge not in the offline
  * dependency set — the PathExtractPropSpec pattern).
  */
class VecKernelsPropSpec extends AnyFunSuite {

  private def arr(xs: Seq[Float]): ArrayData =
    ArrayData.toArrayData(xs.toArray)
  private def larr(xs: Seq[Long]): ArrayData =
    ArrayData.toArrayData(xs.toArray)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val floats = Gen.choose(2, 12)
    .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-100.0f, 100.0f)))

  test("signPack bit i == (v[i] >= 0), first 64 dims only") {
    val g = Gen.listOfN(70, Gen.oneOf(-1.0f, -0.5f, 0.0f, 0.5f, 1.0f))
    samples(g, 30).foreach { xs =>
      val got = VecKernels.signPack(arr(xs))
      xs.take(64).zipWithIndex.foreach { case (x, i) =>
        assert(((got >>> i) & 1L) == (if (x >= 0f) 1L else 0L),
          s"bit $i of $xs")
      }
    }
  }

  test("dot equals the naive double fold, bit for bit") {
    samples(Gen.zip(floats, floats), 40).foreach { case (a, b) =>
      val n = math.min(a.size, b.size)
      val naive = (0 until n).foldLeft(0.0)((s, i) =>
        s + a(i).toDouble * b(i).toDouble)
      assert(VecKernels.dot(arr(a), arr(b)) == naive)
    }
  }

  test("l2 equals the naive formula, bit for bit") {
    samples(Gen.zip(floats, floats), 40).foreach { case (a, b) =>
      val n = math.min(a.size, b.size)
      val naive = math.sqrt((0 until n).foldLeft(0.0)((s, i) => {
        val d = a(i).toDouble - b(i).toDouble; s + d * d
      }))
      assert(VecKernels.l2(arr(a), arr(b)) == naive)
    }
  }

  test("sortedIntersect equals Set intersection size") {
    val g = Gen.listOf(Gen.chooseNum(0L, 30L)).map(_.distinct.sorted)
    samples(Gen.zip(g, g), 40).foreach { case (a, b) =>
      assert(VecKernels.sortedIntersect(larr(a), larr(b)) ==
        a.toSet.intersect(b.toSet).size.toLong, s"$a vs $b")
    }
  }

  test("agreeFrac equals the naive positional comparison") {
    val g = Gen.listOfN(6, Gen.chooseNum(0L, 3L))
    samples(Gen.zip(g, g), 40).foreach { case (a, b) =>
      val naive = (0 until 6).count(i => a(i) == b(i)).toDouble / 6
      assert(VecKernels.agreeFrac(larr(a), larr(b)) == naive)
    }
  }

  test("maxSim equals the naive quantize-then-max-dot composition") {
    def q(x: Float): Long = {
      val d = x.toDouble * 1000
      java.math.BigDecimal.valueOf(d)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
    }
    val m = 3; val dsub = 4
    val g = Gen.listOfN(m * dsub, Gen.chooseNum(-2.0f, 2.0f))
    samples(Gen.zip(g, g), 40).foreach { case (a, b) =>
      val qa = a.map(q); val qb = b.map(q)
      val naive = (0 until m).map { qi =>
        (0 until m).map { dj =>
          (0 until dsub).map(p => qa(qi * dsub + p) * qb(dj * dsub + p)).sum
        }.max
      }.sum
      assert(VecKernels.maxSim(arr(a), arr(b), m, dsub, 1000L) == naive,
        s"$a vs $b")
    }
  }

  test("quantizeVec + maxSimPre equals the one-shot maxSim exactly") {
    val m = 4; val dsub = 3
    val g = Gen.listOfN(m * dsub, Gen.chooseNum(-5.0f, 5.0f))
    samples(Gen.zip(g, g), 40).foreach { case (a, b) =>
      val qa = VecKernels.quantizeVec(arr(a), m * dsub, 1000L)
      val qb = VecKernels.quantizeVec(arr(b), m * dsub, 1000L)
      assert(VecKernels.maxSimPre(qa, qb, m, dsub) ==
        VecKernels.maxSim(arr(a), arr(b), m, dsub, 1000L), s"$a vs $b")
    }
  }

  test("maxSim zero-pads a short vector (missing dims contribute 0)") {
    val a = Seq(1.0f, 1.0f, 1.0f, 1.0f) // only the first token present
    val b = Seq(1.0f, 2.0f, 3.0f, 4.0f, -1.0f, -1.0f, -1.0f, -1.0f)
    // m=2, dsub=2 over a 4-element space: a's tokens = (1,1),(1,1);
    // b's = (1,2),(3,4) -> per a-token max dot = 7000*1000 scaled
    val got = VecKernels.maxSim(arr(a), arr(b), 2, 2, 1000L)
    assert(got == 2L * 7000000L)
    // b truncated to 4 elements on the kernel's min-length guard side:
    // a 4-dim b against m*dsub=8 pads token 2 with zeros
    val got2 = VecKernels.maxSim(arr(b), arr(a), 4, 2, 1000L)
    // b tokens: (1,2),(3,4),(-1,-1),(-1,-1); a tokens: (1,1),(1,1),(0,0),(0,0)
    // per b-token max dot vs a tokens: 3e6, 7e6, 0, 0
    assert(got2 == 10000000L)
  }
}
