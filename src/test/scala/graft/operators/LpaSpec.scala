package graft.operators

import graft.SparkSpec

class LpaSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles joined by one bridge resolve to two communities") {
    // triangle {1,2,3}, triangle {10,11,12}, bridge 3-10
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = labelsOf(Lpa.run(edges, iterations = 5))
    assert(got.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L))
    // each triangle converges on its own minimum label; the bridge
    // cannot outvote two in-triangle neighbors
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(10L) == got(11L) && got(11L) == got(12L))
    assert(got(1L) != got(10L))
  }

  test("synchronous round matches the hand-computed most-frequent/min rule") {
    // star: center 5 with leaves 1,2,3 (symmetrized).
    // round 1: leaves see only {5} -> 5; center sees {1,2,3}, all
    // count 1, min tie-break -> 1
    // round 2: leaves see {1} -> 1; center sees {5,5,5} -> 5
    val und = Seq((5L, 1L), (5L, 2L), (5L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r1 = labelsOf(Lpa.run(edges, iterations = 1))
    assert(r1 == Map(1L -> 5L, 2L -> 5L, 3L -> 5L, 5L -> 1L))
    val r2 = labelsOf(Lpa.run(edges, iterations = 2))
    assert(r2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L))
  }
}
