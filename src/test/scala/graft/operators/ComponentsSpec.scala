package graft.operators

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      pairs.map(p => org.apache.spark.sql.Row(p._1, p._2)).asJava,
      org.apache.spark.sql.types.StructType.fromDDL("a BIGINT, b BIGINT"))
  }

  private def comps(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Components.connectedComponents(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, triangle, and isolated pair resolve to min-id components") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val c = comps(edges(1L -> 2L, 2L -> 3L, 3L -> 4L,
      10L -> 11L, 11L -> 12L, 10L -> 12L, 20L -> 21L))
    assert(Seq(1L, 2L, 3L, 4L).forall(c(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(c(_) == 10L))
    assert(Seq(20L, 21L).forall(c(_) == 20L))
  }

  test("incremental fold-in equals full recompute; delta edges merge prior components") {
    // prior graph: {1,2,3} and {10,11}; delta connects them (3-10) and
    // adds a brand-new pair (20-21)
    val base = edges(1L -> 2L, 2L -> 3L, 10L -> 11L)
    val delta = edges(3L -> 10L, 20L -> 21L)
    val prior = Components.connectedComponents(base, "a", "b")
    val inc = Components.incremental(prior, delta, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = comps(edges(1L -> 2L, 2L -> 3L, 10L -> 11L,
      3L -> 10L, 20L -> 21L))
    assert(inc == full, "incremental labeling diverged from full recompute")
    assert(Seq(1L, 2L, 3L, 10L, 11L).forall(inc(_) == 1L)) // merged
    assert(Seq(20L, 21L).forall(inc(_) == 20L))            // new island
  }

  test("matches a brute-force union-find on a random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    // brute-force union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(x => x -> find(x)).toMap
    // normalize both sides: members grouped by root set
    def clusters(m: Map[Long, Long]) =
      m.groupBy(_._2).values.map(_.keys.toSet).toSet
    assert(clusters(comps(edges(pairs: _*))) == clusters(expected))
  }

  test("adversarial diameter: a 100-node chain converges within few rounds") {
    // min-label alone needs ~diameter rounds; pointer doubling needs
    // O(log D). maxIters = 10 << 99 proves the doubling is doing the
    // work (2^10 = 1024 >> 99); a plain propagation loop would return
    // split components here
    val chain = (0L until 99L).map(i => i -> (i + 1))
    val c = Components.connectedComponents(edges(chain: _*), "a", "b",
        maxIters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 99L).forall(c(_) == 0L), "chain must collapse to one component")
  }

  test("componentSizes counts members per cluster") {
    val sizes = Components.componentSizes(
        Components.connectedComponents(edges(1L -> 2L, 2L -> 3L, 7L -> 8L), "a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(1L -> 3L, 7L -> 2L))
  }
}
