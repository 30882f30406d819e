package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  test("train learns merges in frequency order on a hand-checked corpus") {
    import spark.implicits._
    // word counts: ab x3, abc x1 -> pair (a,b) freq 4 wins rank 1;
    // then (ab, c) freq 1 is the only pair left
    val docs = Seq((1L, "ab ab ab"), (2L, "abc")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 5)
    assert(merges == Seq(("a", "b", 4L), ("ab", "c", 1L)), merges)
  }

  test("tie-break is deterministic: count desc, then (l, r) lexicographic") {
    import spark.implicits._
    // pairs (x,y) and (a,b) both occur once -> (a,b) wins by lexicographic
    val docs = Seq((1L, "xy ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 1)
    assert(merges == Seq(("a", "b", 1L)), merges)
  }

  test("apply is one greedy left-to-right pass per rank") {
    // odd same-char run: (a,a) on aaaaa -> [aa, aa, a], never [aa, a, aa]
    assert(Bpe.applyMerges("aaaaa", Array(("a", "a"))).toSeq ==
      Seq("aa", "aa", "a"))
    // merges apply in rank order; later merges see earlier output
    assert(Bpe.applyMerges("aaaab", Array(("a", "a"), ("aa", "aa"),
      ("aaaa", "b"))).toSeq == Seq("aaaab"))
    // a pair absent at its rank's turn is not revisited later
    assert(Bpe.applyMerges("aab", Array(("aa", "b"), ("a", "a")))
      .toSeq == Seq("aa", "b"))
  }

  test("tokenize output is invariant under partitioning and matches applyMerges") {
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, s"w${i % 7} abba w${i % 7} cat${i % 3}"))
      .toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("b", "a"), ("c", "a"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Bpe.tokenize(df, "doc_id", "text", merges)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(_._1).toSeq
    val one = run(docs.repartition(1))
    assert(one == run(docs.repartition(13)))
    // spot-check one row against the per-word reference path
    val row = one.find(_._1 == 1L).get
    val expect = "w1 abba w1 cat1".split(" ")
      .flatMap(w => Bpe.applyMerges(w, merges.toArray))
    assert(row._3 == expect.mkString(" ") && row._2 == expect.length)
  }

  test("BPE token counts drive sequence packing end-to-end") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 40L).map(i => (i, "aa bb " * (1 + (i % 4).toInt)))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 4)
      .map { case (l, r, _) => (l, r) }
    val counted = Bpe.tokenize(docs, "doc_id", "text", merges)
    val packed = Packing.byTokenOffset(counted, "doc_id", "n_tokens",
      budget = 16L)
    val rows = packed.orderBy("doc_id")
      .select(col("doc_id"), col("n_tokens"), col("token_offset"), col("bin"))
      .collect()
    // offsets are the exclusive prefix sum of n_tokens in id order
    var off = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == off, s"doc ${r.getLong(0)}")
      assert(r.getLong(3) == off / 16L)
      off += r.getLong(1)
    }
  }
}
