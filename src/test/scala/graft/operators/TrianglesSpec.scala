package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TrianglesSpec extends SparkSpec {

  private def tri(edges: Seq[(Long, Long)]): Long = {
    import spark.implicits._
    Triangles.count(edges.toDF("u", "v")).collect().head.getLong(0)
  }

  /** O(V³) brute force over the adjacency set. */
  private def brute(edges: Seq[(Long, Long)]): Long = {
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupMap(_._1)(_._2)
      .view.mapValues(_.toSet).toMap
    val vs = adj.keys.toSeq.sorted
    (for {
      i <- vs; j <- vs if i < j && adj(i)(j)
      k <- vs if j < k && adj(i)(k) && adj(j)(k)
    } yield 1).size.toLong
  }

  test("known small graphs") {
    // K4: C(4,3) = 4 triangles
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(tri(k4) == 4L)
    // path graph: none
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == 0L)
    // two triangles sharing an edge
    assert(tri(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))) == 2L)
  }

  test("matches brute force on a random graph, any partitioning") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 400).map { _ =>
      val a = rnd.nextInt(40) + 1L; val b = rnd.nextInt(40) + 1L; (a, b)
    }.filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).distinct
    assert(tri(edges) == brute(edges))
  }

  test("hub skew: star + rim closes exactly rim-size triangles") {
    // node 0 connected to 1..200, plus rim edges (i, i+1): each rim
    // edge closes one triangle through the hub. Degree orientation
    // sends rim->hub, so the hub generates ZERO wedges — the d² blowup
    // this operator exists to avoid.
    val star = (1L to 200L).map(i => (0L min i, 0L max i))
    val rim = (1L until 200L).map(i => (i, i + 1))
    assert(tri(star ++ rim) == 199L)
  }
}
