package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("a document fully embedded in a larger one scores cont = 1.0") {
    val small = (1 to 12).map(i => s"w$i").mkString(" ")
    val big = small + " " + (100 to 140).map(i => s"x$i").mkString(" ")
    val docs = mkDocs(1L -> small, 2L -> big)
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.9).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getDouble(2) == 1.0)
    // ...while symmetric Jaccard misses it entirely at the same bar
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.9)
    assert(jac.count() == 0)
  }

  test("containment >= jaccard on every emitted pair") {
    val docs = graft.engine.Tables(spark, sf, "documents")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.0 + 1e-9, maxDocFreq = 5)
      .withColumnRenamed("cont", "c")
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.0 + 1e-9, maxDocFreq = 5)
      .withColumnRenamed("jac", "j")
    val bad = cont.join(jac, Seq("a", "b"))
      .filter(col("c") < col("j")).count()
    assert(bad == 0)
  }

  test("threshold filters pairs; disjoint docs never pair") {
    val docs = mkDocs(
      1L -> (1 to 10).map(i => s"a$i").mkString(" "),
      2L -> (1 to 10).map(i => s"b$i").mkString(" "))
    assert(Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.1).count() == 0)
  }

  test("posting cut removes ubiquitous shingles from the measure") {
    // shared boilerplate in every doc; distinct bodies
    val boiler = "the quick brown fox jumps over the lazy dog again"
    val docs = mkDocs((1L to 8L).map(i =>
      i -> s"$boiler body$i unique$i content$i words$i here$i"): _*)
    // with the cut at maxDocFreq=5, boilerplate shingles (df=8) leave
    // the space; bodies are disjoint -> no pair survives
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5, maxDocFreq = 5)
    assert(pairs.count() == 0)
  }
}
