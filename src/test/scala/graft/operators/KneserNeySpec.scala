package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b a b c"),
    (2L, "a b c d"),
    (3L, "b c d a"),
    (4L, "c a b")
  ).toDF("doc_id", "text")

  test("model counts match hand-derived KN statistics") {
    val m = KneserNey.model(corpus, "doc_id", "text")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))))
      .toMap
    // bigrams: d1: ab ba ab bc | d2: ab bc cd | d3: bc cd da | d4: ca ab
    // c2: ab=4 ba=1 bc=3 cd=2 da=1 ca=1  → N1+(··)=6 distinct pairs
    assert(m(("a", "b"))._1 == 4)
    assert(m(("b", "c"))._1 == 3)
    assert(m(("c", "d"))._1 == 2)
    // c1(a·)=ab+ba? no: histories — a: ab(4)+? a only precedes b → 4
    //   plus... d3 'd a' ends, d4 'c a b' → a precedes b. c1(a)=4
    assert(m(("a", "b"))._2 == 4 && m(("a", "b"))._3 == 1) // N1+(a·)=1
    // b precedes a(1) and c(3): c1(b)=4, N1+(b·)=2
    assert(m(("b", "a"))._2 == 4 && m(("b", "a"))._3 == 2)
    // N1+(·b)=2 (a b, c b? no 'c b' absent — a b, ... ) 'b' follows a
    //   only? d1 'a b' ×2, d2 'a b', d4 'a b' — and nothing else → 1
    assert(m(("a", "b"))._4 == 1)
    assert(m(("a", "b"))._5 == 6) // global continuation total
  }

  test("interpolated probabilities sum to 1 over the continuation vocabulary") {
    val rows = KneserNey.model(corpus, "doc_id", "text").collect()
    val d = KneserNey.Discount
    val n1pAll = rows.head.getLong(6).toDouble
    val byW1 = rows.groupBy(_.getString(0))
    // Pcont per distinct w2
    val pcont = rows.map(r => r.getString(1) -> r.getLong(5).toDouble / n1pAll)
      .toMap
    byW1.foreach { case (_, rs) =>
      val c1 = rs.head.getLong(3).toDouble
      val n1pFwd = rs.head.getLong(4).toDouble
      val seenMass = rs.map(r => (r.getLong(2) - d) / c1).sum
      // interpolation term over the WHOLE continuation vocab
      val backoffMass = d * n1pFwd / c1 * pcont.values.sum
      assert(math.abs(seenMass + backoffMass - 1.0) < 1e-9,
        s"KN must be a proper distribution, got ${seenMass + backoffMass}")
    }
  }

  test("scoring: seen, unseen-pair, and OOV branches are exact and order-independent") {
    val train = corpus.filter(col("doc_id") <= 3L)
    val m = KneserNey.model(train, "doc_id", "text")
    // 'c a': both words seen, pair unseen → bw(c)+cont(a);
    // 'a q': q never seen → OOV penalty; 'a b': seen
    val probe = Seq((10L, "a b"), (11L, "c a"), (12L, "a q"))
      .toDF("doc_id", "text")
    val sc = KneserNey.scoreDocs(probe, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val rows = m.collect()
    def stat(w1: String) = rows.filter(_.getString(0) == w1).head
    val n1pAll = rows.head.getLong(6).toDouble
    // seen 'a b'
    val ab = rows.filter(r => r.getString(0) == "a" && r.getString(1) == "b").head
    val lpSeen = math.floor(1e6 * math.log(
      (ab.getLong(2) - 0.75) / ab.getLong(3) +
        0.75 * ab.getLong(4) / ab.getLong(3) * ab.getLong(5) / n1pAll)).toLong
    assert(sc(10L) == ((1L, lpSeen)))
    // unseen pair 'c a' = bw(c) + cont(a)
    val c = stat("c")
    val bwC = math.floor(1e6 * math.log(
      0.75 * c.getLong(4) / c.getLong(3))).toLong
    val contA = rows.filter(_.getString(1) == "a").head.getLong(5)
    val contMicro = math.floor(1e6 * math.log(contA / n1pAll)).toLong
    assert(sc(11L) == ((1L, bwC + contMicro)))
    // OOV
    assert(sc(12L) == ((1L, KneserNey.OovPenaltyMicro)))
    // partition invariance: same integers at any parallelism
    val sc8 = KneserNey.scoreDocs(probe.repartition(8), "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sc8 == sc.map { case (k, v) => k -> v._2 })
  }
}
