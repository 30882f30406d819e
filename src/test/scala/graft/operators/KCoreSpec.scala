package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  /** Symmetrize an undirected edge list and peel. */
  private def peel(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    val sym = edges.flatMap(e => Seq(e, e.swap)).distinct
    KCore.peel(sym.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference peeling, same fixed-round semantics. */
  private def brute(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] = {
    var e = edges.flatMap(p => Seq(p, p.swap)).distinct.toSet
    for (_ <- 1 to rounds) {
      val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val keep = deg.collect { case (n, d) if d >= k => n }.toSet
      e = e.filter(p => keep(p._1) && keep(p._2))
    }
    e.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
  }

  test("triangle with a tail peels to the triangle (multi-round)") {
    // triangle 1-2-3 plus tail 3-4, 4-5: round 1 drops 5 (deg 1),
    // round 2 drops 4 (its degree FELL to 1 when 5 left) — the
    // cascade is why one peel round is not the k-core
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(peel(g, k = 2, rounds = 1).keySet == Set(1L, 2L, 3L, 4L))
    assert(peel(g, k = 2, rounds = 2) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // converged: extra rounds change nothing
    assert(peel(g, k = 2, rounds = 5) == peel(g, k = 2, rounds = 2))
  }

  test("k above the max degree empties the graph") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(peel(g, k = 3, rounds = 1).isEmpty)
  }

  test("matches reference peeling on a random graph at each round") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 300).map { _ =>
      val a = rnd.nextInt(60) + 1L; val b = rnd.nextInt(60) + 1L; (a, b)
    }.filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).distinct
    for (r <- 1 to 4)
      assert(peel(edges, k = 3, rounds = r) == brute(edges, 3, r),
        s"round $r")
  }
}
