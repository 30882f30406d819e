package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

/** Bigram-LM scoring and data-card semantics (hand-computed fixtures;
  * the cross-engine formula equivalence is pinned by the q76/q77
  * oracles).
  */
class TextOpsLmSpec extends SparkSpec {
  import spark.implicits._

  test("bigramLogProb matches a hand-computed two-doc corpus") {
    // corpus: "a b a b" + "a b"  -> bigrams: (a b)x3, (b a)x1
    // c2(a,b)=3 c2(b,a)=1 c1(a)=3 c1(b)=1; uni: a=3 b=3, T=6
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextOps.bigramLogProb(docs, "doc_id", "text", lambda = 0.8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pAB = 0.8 * 3.0 / 3.0 + 0.2 * 3.0 / 6.0 // p(b|a)
    val pBA = 0.8 * 1.0 / 1.0 + 0.2 * 3.0 / 6.0 // p(a|b)
    val d1 = (2 * math.log(pAB) + math.log(pBA)) / 3.0
    val d2 = math.log(pAB)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(got.length == 2)
    assert(got(0) == ((1L, 3L, r4(d1))), s"got ${got(0)} want $d1")
    assert(got(1) == ((2L, 1L, r4(d2))), s"got ${got(1)} want $d2")
  }

  test("bigramLogProb excludes docs with fewer than two words") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val ids = TextOps.bigramLogProb(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0))
    assert(ids.toSeq == Seq(3L))
  }

  test("dataCard: one row per language, consistent counts") {
    val docs = Tables(spark, sf, "documents")
    val card = TextOps.dataCard(docs, "lang", "source", "text", "n_chars")
      .orderBy("lang").collect()
    val langs = docs.select("lang").distinct().count()
    assert(card.length == langs)
    val totalDocs = card.map(_.getLong(1)).sum
    assert(totalDocs == docs.count())
    card.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_sources <= n_docs")
      val dup = r.getDouble(7)
      assert(dup >= 0.0 && dup < 1.0)
      assert(r.getDouble(5) <= r.getDouble(6), "p50 <= p90")
    }
  }
}
