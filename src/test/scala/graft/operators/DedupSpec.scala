package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  private lazy val docs = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, "the quick brown fox jumps over the lazy dog"),
      org.apache.spark.sql.Row(2L, "the quick brown fox jumps over the lazy dog"),
      org.apache.spark.sql.Row(3L, "the quick brown fox jumps over the lazy cat"),
      org.apache.spark.sql.Row(4L, "completely different text about spark engines"),
      org.apache.spark.sql.Row(5L, "short")
    ).asJava, schema)
  }

  test("exact dedup keeps lowest id and counts copies") {
    val r = Dedup.exact(docs, "doc_id", "text").orderBy("keep_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("shingles: unigrams and trigram windows; short docs empty") {
    val uni = Dedup.shingles(docs.filter(col("doc_id") === 5), "doc_id", "text", 1)
    assert(uni.collect().map(_.getString(1)).toSeq == Seq("short"))
    val tri = Dedup.shingles(docs.filter(col("doc_id") === 5), "doc_id", "text", 3)
    assert(tri.count() == 0) // fewer than n words => no shingles
    val tri1 = Dedup.shingles(docs.filter(col("doc_id") === 1), "doc_id", "text", 3)
      .collect().map(_.getString(1)).toSet
    assert(tri1.contains("the quick brown") && tri1.contains("the lazy dog"))
    assert(tri1.size == 7) // 9 words -> 7 windows, all distinct
  }

  test("jaccardPairs finds identical and near-identical pairs") {
    val r = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .orderBy("a", "b").collect()
    val pairs = r.map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(pairs.contains((1L, 2L))) // identical: jac = 1.0
    val jac12 = r.find(x => x.getLong(0) == 1L && x.getLong(1) == 2L).get.getDouble(2)
    assert(jac12 == 1.0)
    // 1 vs 3 share 6 of 8 distinct trigrams => 6/8 = 0.75
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("prefix-filtered jaccard equals the plain inverted-index jaccard") {
    val docs01 = graft.engine.Tables(spark, sf, "documents")
    for (t <- Seq(0.5, 0.8); rarity <- Seq(true, false)) {
      val plain = Dedup.jaccardPairs(docs01, "doc_id", "text", 3, t)
        .collect().map(_.toString).sorted.toSeq
      val prefix = Dedup.jaccardPairsPrefix(docs01, "doc_id", "text", 3, t,
          rarityOrder = rarity)
        .collect().map(_.toString).sorted.toSeq
      assert(prefix == plain, s"threshold $t rarity=$rarity mismatch")
    }
  }

  test("jaccardAuto picks the plan by threshold, same results either side") {
    val docs01 = graft.engine.Tables(spark, sf, "documents")
    // above the crossover: the prefix path (identifiable by its codegen
    // merge-intersect kernel in the optimized plan)
    val hi = Dedup.jaccardAuto(docs01, "doc_id", "text", 3, threshold = 0.8)
    assert(hi.queryExecution.optimizedPlan.toString.contains(
      "sortedlongintersect"), "t=0.8 should select the prefix plan")
    // below: the inverted-index path (no merge-intersect kernel)
    val lo = Dedup.jaccardAuto(docs01, "doc_id", "text", 3, threshold = 0.5)
    assert(!lo.queryExecution.optimizedPlan.toString.contains(
      "sortedlongintersect"), "t=0.5 should select the inverted index")
    // both branches produce the exact relation
    assert(hi.collect().map(_.toString).sorted.toSeq ==
      Dedup.jaccardPairs(docs01, "doc_id", "text", 3, 0.8)
        .collect().map(_.toString).sorted.toSeq)
    // a posting cut is only meaningful on the inverted-index branch
    intercept[IllegalArgumentException] {
      Dedup.jaccardAuto(docs01, "doc_id", "text", 3, 0.9, maxDocFreq = 5)
    }
  }

  test("maxDocFreq drops over-frequent shingles from the posting list") {
    val r = Dedup.jaccardPairs(docs, "doc_id", "text", n = 1,
      threshold = 0.01, maxDocFreq = 2)
    // "the" appears in docs 1,2,3 (freq 3) and is dropped; pairs survive
    // on remaining tokens
    assert(r.count() > 0)
  }

  test("simHashPairs equals the brute-force Hamming join (full recall)") {
    val corpus = graft.engine.Tables(spark, sf, "documents")
    for (budget <- Seq(0, 3)) {
      val blocked = Dedup.simHashPairs(corpus, "doc_id", "text",
          maxHamming = budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val fps = Dedup.simHash(corpus, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val brute = (for {
        (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
        h = java.lang.Long.bitCount(fa ^ fb) if h <= budget
      } yield (ia, ib, h.toLong)).toSet
      assert(blocked == brute, s"budget=$budget")
      if (budget == 0) assert(blocked.nonEmpty) // sf corpora carry exact dups
    }
  }

  test("embeddingPairsLsh: exact duplicates always collide; precision exact") {
    val emb = graft.engine.Tables(spark, sf, "embeddings")
    // plant an exact duplicate pair with ids beyond the corpus
    val dup = emb.filter(col("vec_id") === 0)
      .select(lit(900001L).as("vec_id"), col("embedding"), col("label"))
      .unionByName(emb.filter(col("vec_id") === 0)
        .select(lit(900002L).as("vec_id"), col("embedding"), col("label")))
    val r = Dedup.embeddingPairsLsh(emb.unionByName(dup),
        "vec_id", "embedding", threshold = 0.9)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    // identical vectors share every bucket => guaranteed candidate
    assert(r.exists(p => p._1 == 900001L && p._2 == 900002L && p._3 == 1.0))
    assert(r.exists(p => p._1 == 0L && (p._2 == 900001L || p._2 == 900002L)))
    // precision: every emitted pair really clears the threshold
    assert(r.forall(_._3 > 0.9))
  }

  test("decontaminate flags training docs overlapping the eval set") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING")
    val eval = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(100L, "the quick brown fox jumps over the lazy dog")
    ).asJava, schema)
    val train = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, "the quick brown fox jumps over the lazy dog"), // verbatim leak
      org.apache.spark.sql.Row(2L, "an entirely unrelated document about engines"),
      org.apache.spark.sql.Row(3L, "ok")                                           // too short to shingle
    ).asJava, schema)
    val r = Dedup.decontaminate(train, eval, "doc_id", "text",
        n = 3, maxOverlapFrac = 0.3)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Double]("overlap_frac"), x.getAs[Boolean]("contaminated"))).toMap
    assert(r(1L) == ((1.0, true)))   // every trigram leaked
    assert(r(2L) == ((0.0, false)))
    assert(r(3L) == ((0.0, false))) // unshingleable counts as clean
  }

  test("minHash LSH candidates cover all true near-dup pairs (recall)") {
    val truth = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.7)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val est = Dedup.minHashPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(truth.subsetOf(est),
      s"missing: ${truth.diff(est)}") // banded LSH must catch jac>=0.7 pairs
  }

  test("simHash: identical texts share fingerprints, near texts are close") {
    val fp = Dedup.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    val d13 = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    val d14 = java.lang.Long.bitCount(fp(1L) ^ fp(4L))
    assert(d13 < d14, s"near-dup hamming $d13 should be < unrelated $d14")
  }

  test("hamming distance expression") {
    val r = docs.select(Dedup.hamming(lit(0b1011L), lit(0b0001L))).collect()
    assert(r.head.getInt(0) == 2)
  }

  test("duplicatedSpans: shared 5-gram occurrences are counted per doc") {
    // docs 1 and 2 are identical (9 words -> 5 spans, all duplicated);
    // doc 3 differs only in its last word, so the 4 spans that do not
    // touch it are shared and only the final span is unique; doc 4 is
    // disjoint; doc 5 is too short for any span
    val r = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) == ((5L, 5L)))
    assert(r(2L) == ((5L, 5L)))
    assert(r(3L) == ((5L, 4L)))
    assert(r(4L)._2 == 0L)
    assert(!r.contains(5L)) // "short" has < 5 words: no spans, no row
  }

  test("removeDuplicatedSpans: keeper keeps, others drop covered words only") {
    val r = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2), x.getLong(3))))
      .toMap
    // doc 1 is the min-id keeper of every shared span: untouched
    assert(r(1L) == (("the quick brown fox jumps over the lazy dog", 9L, 0L)))
    // doc 2 is fully covered by spans doc 1 keeps: everything drops
    assert(r(2L) == (("", 0L, 9L)))
    // doc 3: spans 0-3 are shared (cover words 0-7); its last span
    // "jumps over the lazy cat" is unique, but only word 8 ("cat")
    // escapes the shared spans' coverage — boundary overlap pins that
    // coverage is by word position, not by span identity
    assert(r(3L) == (("cat", 1L, 8L)))
    // doc 4 shares nothing; doc 5 is shorter than n — both unchanged
    // (and present, unlike the stats operator which has no row for 5)
    assert(r(4L) == (("completely different text about spark engines", 6L, 0L)))
    assert(r(5L) == (("short", 1L, 0L)))
  }

  test("incremental minhash: batch dedups against a PERSISTED index") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely unrelated document about databases")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // dup of 1+2
      (11L, "fresh new content with no prior match at all")
    ).toDF("doc_id", "text")

    // build the index once, round-trip it through parquet — the later
    // incremental run sees ONLY (id, sig), never the corpus text
    val dir = java.nio.file.Files.createTempDirectory("mhidx").toString
    Dedup.minHashIndex(corpus, "doc_id", "text", n = 3)
      .write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)

    val pairs = Dedup.minHashPairsAgainst(idx, batch, "doc_id", "text",
        n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exact dups of both indexed copies, estimated Jaccard 1.0
    assert(pairs.toSet == Set((1L, 10L, 1.0), (2L, 10L, 1.0)), pairs.toSeq)
    // and NO batch-internal or index-internal pairs leak into the output

    // re-checking a batch that is already in the index must not
    // self-match (a == b excluded), only report its true near-dups
    val again = Dedup.minHashPairsAgainst(idx,
        corpus.filter($"doc_id" === 1L), "doc_id", "text",
        n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSet == Set((2L, 1L)), again.toSeq)
  }

  test("incremental simhash: batch vs stored fingerprints, cross-set recall") {
    import spark.implicits._
    // index holds docs 1 (dog) and 4 (disjoint); the batch re-sends the
    // dog text verbatim and a near-variant; recall must equal the
    // full-corpus pair join restricted to (index x batch)
    val idx = Dedup.simHash(docs.filter($"doc_id".isin(1L, 4L)),
      "doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "the quick brown fox jumps over the lazy cat"),
      (12L, "utterly different words in every position here")
    ).toDF("doc_id", "text")
    val got = Dedup.simHashPairsAgainst(idx, batch, "doc_id", "text",
        maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reference: full pair join over index ∪ batch, keep cross-set pairs
    val full = Dedup.simHashPairs(
        docs.filter($"doc_id".isin(1L, 4L)).unionByName(batch),
        "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => a <= 4L && b >= 10L }.toSet
    assert(got == full, s"got=$got full=$full")
    assert(got.contains((1L, 10L, 0L)), "verbatim resend at hamming 0")
    assert(!got.exists(p => p._1 == 4L), "disjoint index doc matches nothing")
  }

  test("bloom decontamination equals the exact broadcast plan row-for-row") {
    import spark.implicits._
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // fully contaminated
      (2L, "alpha beta gamma then something else entirely"), // partial
      (3L, "no overlap with the held out set at all"),
      (4L, "xy") // too short to shingle: clean by definition
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"overlap_frac", $"contaminated")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
    val exact = rows(Dedup.decontaminate(train, eval, "doc_id", "text",
      n = 3, maxOverlapFrac = 0.3))
    val bloom = rows(Dedup.decontaminateBloom(train, eval, "doc_id", "text",
      n = 3, maxOverlapFrac = 0.3))
    assert(bloom == exact, s"bloom=$bloom exact=$exact")
    assert(bloom.find(_._1 == 1L).get._3, "planted dup must be flagged")
    assert(!bloom.find(_._1 == 3L).get._3)
    assert(bloom.find(_._1 == 4L).get._2 == 0.0)
    // empty eval set: nothing flagged, no NPE from the null bloom
    val none = rows(Dedup.decontaminateBloom(train,
      eval.filter(lit(false)), "doc_id", "text", n = 3,
      maxOverlapFrac = 0.3))
    assert(none.forall(r => r._2 == 0.0 && !r._3))
  }

  test("fuzzyPairs: near-identical docs pair, distinct ones don't") {
    val got = Dedup.fuzzyPairs(docs, "doc_id", "text", maxDistFrac = 0.3)
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 1/2 identical (d=0), 1/3 and 2/3 differ by one word (d=3);
    // 4 and 5 share no block with anything
    assert(got.toSeq == Seq((1L, 2L, 0L), (1L, 3L, 3L), (2L, 3L, 3L)))
  }

  test("fuzzyPairs: suffix signature recovers pairs whose prefix differs") {
    import spark.implicits._
    // prefix edit ("An" vs "The") breaks k1; the shared last-two-token
    // signature still blocks them together — OR-blocking recall
    val d2 = Seq(
      (1L, "The brown fox naps by the quiet river bank"),
      (2L, "Own brown fox naps by the quiet river bank"))
      .toDF("doc_id", "text")
    val got = Dedup.fuzzyPairs(d2, "doc_id", "text", maxDistFrac = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 3L)))
  }

  test("fuzzyPairs: maxBlock cap drops oversized blocks, observable via overflow") {
    import spark.implicits._
    // five identical docs: every signature block has size 5
    val many = (1L to 5L).map(i => (i, "aaa bbb ccc ddd")).toDF("doc_id", "text")
    // cap below the block size: no candidate survives either axis
    assert(Dedup.fuzzyPairs(many, "doc_id", "text", maxDistFrac = 0.3,
      maxBlock = 4).count() == 0)
    val over = Dedup.fuzzyOverflowBlocks(many, "doc_id", "text", maxBlock = 4)
      .orderBy("axis").collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3)))
    assert(over.toSeq == Seq(
      ("k1", "aaa bbb", 5L), ("k2", "ccc ddd", 5L)))
    // cap at the block size: all 10 pairs, nothing dropped
    assert(Dedup.fuzzyPairs(many, "doc_id", "text", maxDistFrac = 0.3,
      maxBlock = 5).count() == 10)
    assert(Dedup.fuzzyOverflowBlocks(many, "doc_id", "text", maxBlock = 5)
      .count() == 0)
  }

  test("nearDupSurvivors: keep-longest per cluster, min-id tie-break, singletons survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L),  // cluster {1,2,3} via 1-2, 2-3
      (4L, 15L), (5L, 15L),             // cluster {4,5}: equal length
      (6L, 7L))                         // singleton, no incident pair
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val got = Dedup.nearDupSurvivors(docs, "doc_id", "n_chars", pairs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 0L), // 2 is longest in {1,2,3}
      (4L, 4L, 1L), (5L, 4L, 0L),               // tie -> smaller id wins
      (6L, 6L, 1L)))                            // singleton survives
  }

  test("softDedupWeights: exact ppm novelty from bigram doc frequencies") {
    import spark.implicits._
    // docA/docB identical; docC shares only "aa bb" with them.
    // df("aa bb")=3, df("bb cc")=2, df("bb dd")=1 — exact integer ppm:
    //   A,B: (1000000 div 3 + 1000000 div 2) div 2 = 416666
    //   C:   (1000000 div 3 + 1000000 div 1) div 2 = 666666
    val tiny = Seq((1L, "aa bb cc"), (2L, "aa bb cc"), (3L, "aa bb dd"))
      .toDF("doc_id", "text")
    val got = Dedup.softDedupWeights(tiny, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 416666L), (2L, 2L, 416666L),
      (3L, 2L, 666666L)))
    // corpus-scale sanity: weights live in (0, 1e6], and the score is
    // a pure function of the corpus (partitioning-independent)
    val w1 = Dedup.softDedupWeights(docs, "doc_id", "text", n = 2)
    assert(w1.filter(col("novelty_ppm") <= 0 ||
      col("novelty_ppm") > 1000000).count() == 0)
    val w2 = Dedup.softDedupWeights(docs.repartition(13), "doc_id", "text", n = 2)
    assert(w1.orderBy("doc_id").collect().map(_.toString).toSeq ==
      w2.orderBy("doc_id").collect().map(_.toString).toSeq)
  }
}
