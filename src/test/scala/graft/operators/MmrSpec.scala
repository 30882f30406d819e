package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

/** MMR diversified top-k (q182): golden-pinned in the oracle, so its
  * SEMANTICS are certified here — degeneration to plain top-k at λ=1,
  * the diversity trade at λ<1, and partitioning invariance (the pin is
  * only as strong as the op's determinism).
  */
class MmrSpec extends SparkSpec {
  private lazy val emb = Tables(spark, sf, "embeddings").cache()
  private lazy val queries = emb.filter(col("vec_id") < 5)

  test("lambda=1 degenerates to plain relevance top-k") {
    val mmr = Similarity.mmrTopK(queries, emb, "vec_id", "embedding",
        k = 8, lambda = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).sorted
    val plain = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding",
        k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).sorted
    assert(mmr.toSeq == plain.toSeq)
  }

  test("lambda<1 selects a set at least as diverse as plain top-k") {
    def meanPairwiseSim(sel: Map[Long, Seq[Long]]): Double = {
      val vecs = emb.filter(col("vec_id") < 1000000)
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      def cos(a: Array[Float], b: Array[Float]): Double = {
        def dot(x: Array[Float], y: Array[Float]) =
          x.zip(y).map { case (p, q) => p.toDouble * q }.sum
        dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
      }
      val sims = sel.toSeq.flatMap { case (_, ids) =>
        for (i <- ids.indices; j <- i + 1 until ids.size)
          yield cos(vecs(ids(i)), vecs(ids(j)))
      }
      sims.sum / sims.size
    }
    def selection(lambda: Double): Map[Long, Seq[Long]] =
      Similarity.mmrTopK(queries, emb, "vec_id", "embedding",
          k = 8, lambda = lambda)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val diverse = meanPairwiseSim(selection(0.5))
    val plain = meanPairwiseSim(selection(1.0))
    assert(diverse <= plain + 1e-9, s"mmr=$diverse plain=$plain")
    // on clustered embeddings the trade must actually bite
    assert(diverse < plain - 1e-6, s"mmr=$diverse plain=$plain")
  }

  test("selection is a pure function of the data (partitioning-invariant)") {
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.mmrTopK(queries, c, "vec_id", "embedding",
          k = 8, lambda = 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1),
          r.getDouble(3))).sorted.toSeq
    assert(run(emb) == run(emb.repartition(11)))
  }

  test("k larger than the candidate pool returns the whole pool, ranked") {
    val tiny = emb.filter(col("vec_id") < 6) // pool of 5 non-self cands
    val r = Similarity.mmrTopK(queries.limit(1), tiny, "vec_id", "embedding",
        k = 50, lambda = 0.7).collect()
    assert(r.length == 5)
    assert(r.map(_.getLong(2)).sorted.toSeq == (1L to 5L))
  }
}
