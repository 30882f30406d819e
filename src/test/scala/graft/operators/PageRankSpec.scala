package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("runDangling matches hand-computed fixed point on a graph with a sink") {
    // 1 -> {2,3}, 2 -> {3}; node 3 is a sink holding mass each round
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = ranksOf(PageRank.runDangling(edges, iterations = 2))
    // iter 1: dangling share = 1000000 div 3 = 333333
    //   r(1) = 150000 + (85 *  333333) div 100 =  433333
    //   r(2) = 150000 + (85 *  833333) div 100 =  858333
    //   r(3) = 150000 + (85 * 1833333) div 100 = 1708333
    // iter 2: dangling share = 1708333 div 3 = 569444
    //   r(1) = 150000 + (85 *  569444) div 100 =  634027
    //   r(2) = 150000 + (85 *  786110) div 100 =  818193
    //   r(3) = 150000 + (85 * 1644443) div 100 = 1547776
    assert(got == Map(1L -> 634027L, 2L -> 818193L, 3L -> 1547776L))
    // redistribution conserves mass up to integer truncation
    assert(math.abs(got.values.sum - 3L * PageRank.Scale) < 10L)
  }

  test("runDangling equals run on a sink-free symmetrized graph") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val a = ranksOf(PageRank.run(edges, iterations = 4))
    val b = ranksOf(PageRank.runDangling(edges, iterations = 4))
    assert(a == b, "zero dangling mass must reduce to the plain recurrence")
  }

  test("personalized matches hand-computed fixed point; rank-0 nodes persist") {
    // symmetrized path 1-2-3, restart at 1
    val und = Seq((1L, 2L), (2L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = ranksOf(PageRank.personalized(edges, source = 1L, iterations = 2))
    // iter 1: 1 -> 150000 (base only), 2 -> (85*1000000) div 100,
    //         3 -> 0 (must stay in the relation — it feeds 2 next round)
    // iter 2: 1: 150000 + (85*425000) div 100 = 511250
    //         2: (85*150000) div 100 = 127500
    //         3: (85*425000) div 100 = 361250
    assert(got == Map(1L -> 511250L, 2L -> 127500L, 3L -> 361250L))
  }

  test("reliable checkpoint path (graft.checkpoint.dir) gives identical ranks") {
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val default = ranksOf(PageRank.run(edges, iterations = 3))
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(graft.engine.Checkpoints.ConfKey, dir)
    try {
      val reliable = ranksOf(PageRank.run(edges, iterations = 3))
      assert(reliable == default)
      // the reliable path must actually have checkpointed into the dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally spark.conf.unset(graft.engine.Checkpoints.ConfKey)
  }
}
