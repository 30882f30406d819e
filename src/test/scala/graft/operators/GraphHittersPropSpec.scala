package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property certification (seeded ScalaCheck) for the round-5 graph and
  * summary operators:
  *  - HeavyHitters: the two-pass plan must equal the exact HAVING
  *    answer on ANY stream shape and partitioning — the MG candidate
  *    set is merge-order-dependent, the OUTPUT may never be.
  *  - Triangles: degree-orientation + merge-intersect must equal the
  *    O(V³) brute-force count on arbitrary random graphs.
  */
class GraphHittersPropSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def gen[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // streams mixing zipf-ish hitters with a uniform distinct tail
  private val streamGen: Gen[Seq[String]] = for {
    nHit <- Gen.choose(1, 6)
    hitWeights <- Gen.listOfN(nHit, Gen.choose(50, 400))
    tailN <- Gen.choose(0, 2000)
  } yield hitWeights.zipWithIndex.flatMap { case (w, i) =>
    Seq.fill(w)(s"hot$i")
  } ++ (1 to tailN).map(i => s"tail$i")

  test("heavy hitters equal the exact answer on random streams/partitionings") {
    import org.apache.spark.sql.functions._
    (1L to 10L).foreach { seed =>
      val rows = gen(streamGen, seed)
      val frac = gen(Gen.oneOf(0.01, 0.02, 0.05), seed)
      val parts = gen(Gen.choose(1, 19), seed)
      val d = spark.createDataFrame(
        rows.map(Row(_)).asJava, StructType.fromDDL("k STRING"))
        .repartition(parts)
      val got = HeavyHitters.exactOverThreshold(d, "k", frac)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = rows.length
      val expect = rows.groupBy(identity).view.mapValues(_.length.toLong)
        .filter(_._2 > n * frac).toMap
      assert(got == expect, s"seed=$seed frac=$frac parts=$parts")
    }
  }

  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    nV <- Gen.choose(5, 45)
    nE <- Gen.choose(0, 350)
    es <- Gen.listOfN(nE,
      Gen.zip(Gen.choose(1L, nV.toLong), Gen.choose(1L, nV.toLong)))
  } yield es.filter(e => e._1 != e._2)
    .map(e => (e._1 min e._2, e._1 max e._2)).distinct

  private def brute(edges: Seq[(Long, Long)]): Long = {
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupMap(_._1)(_._2)
      .view.mapValues(_.toSet).toMap
    val vs = adj.keys.toSeq.sorted
    (for {
      i <- vs; j <- vs if i < j && adj(i)(j)
      k <- vs if j < k && adj(i)(k) && adj(j)(k)
    } yield 1).size.toLong
  }

  test("triangle count equals brute force on random graphs") {
    import spark.implicits._
    (100L to 109L).foreach { seed =>
      val edges = gen(graphGen, seed)
      val got =
        if (edges.isEmpty) 0L
        else Triangles.count(edges.toDF("u", "v")).collect().head.getLong(0)
      assert(got == brute(edges), s"seed=$seed edges=${edges.size}")
    }
  }
}
