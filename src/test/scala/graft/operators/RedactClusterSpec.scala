package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.engine.Tables

class RedactClusterSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, urls and digit runs with placeholders") {
    val docs = Seq(
      (1L, "mail me at jo.doe+x@site.co or see https://x.io/p?q=1 ok"),
      (2L, "card 1234567890123 and 42 stays"),
      (3L, "clean text")
    ).toDF("doc_id", "text")
    val got = TextOps.redactPii(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got(0)._2 == "mail me at <EMAIL> or see <URL> ok")
    assert(got(1)._2 == "card <NUM> and 42 stays")
    assert(got(2)._2 == "clean text")
    assert(got(2)._3 == 0L)
    assert(got(0)._3 ==
      got(0)._2.length * -1 + "mail me at jo.doe+x@site.co or see https://x.io/p?q=1 ok".length)
  }

  test("clusterTopTerms: k distinct clusters, rn bounded, scores ranked") {
    val docs = Tables(spark, sf, "documents")
    val emb = Tables(spark, sf, "embeddings")
      .withColumnRenamed("vec_id", "doc_id")
    val got = Similarity.clusterTopTerms(docs, emb,
      "doc_id", "text", "embedding", topK = 5, nClusters = 8).cache()
    assert(got.select("cluster").distinct().count() == 8)
    assert(got.groupBy("cluster").count().agg(max("count")).head().getLong(0) <= 5)
    // within each cluster, scores are non-increasing in rn
    val bad = got.as[(Long, String, Double, Long)].collect().toSeq
      .groupBy(_._1).values.flatMap { rows =>
        val sorted = rows.sortBy(_._4)
        sorted.sliding(2).collect {
          case Seq(a, b) if a._3 < b._3 => (a, b)
        }
      }
    assert(bad.isEmpty, bad.toString)
  }
}
