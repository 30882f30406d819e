package graft.operators

import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val tmp = java.nio.file.Files.createTempDirectory("invidx-spec-")
      .toString
    val docs = Seq(
      (1L, "hash join is a hash join thing"),
      (2L, "sort merge join beats hash sometimes"),
      (3L, "hash join"),
      (4L, "join hash reversed order"),
      (5L, "no relevant terms here")).toDF("doc_id", "text")
    InvertedIndex.build(docs, "doc_id", "text", tmp)
    tmp
  }

  test("index-backed phrase query equals the scan-based window result") {
    val got = InvertedIndex.phraseQuery(spark, dir, Seq("hash", "join"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 1 has the phrase twice, doc 3 once; doc 4 is reversed
    assert(got == Seq((1L, 2L), (3L, 1L)))
    // three-word phrase crosses two adjacency joins
    val three = InvertedIndex.phraseQuery(spark, dir,
        Seq("sort", "merge", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(three == Seq((2L, 1L)))
  }

  test("index-backed BM25 equals the corpus-scan ranking exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join is a hash join thing"),
      (2L, "sort merge join beats hash sometimes"),
      (3L, "hash join"),
      (4L, "join hash reversed order"),
      (5L, "no relevant terms here")).toDF("doc_id", "text")
    val viaIndex = InvertedIndex.bm25Query(spark, dir,
        Seq("hash", "merge"), topN = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaScan = TextOps.bm25Search(docs, "doc_id", "text",
        Seq("hash", "merge"), topN = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaIndex == viaScan)
    assert(viaIndex.nonEmpty)
  }

  test("tombstoned docs vanish from results; no postings rewritten") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("invidx-del-")
      .toString
    val docs = Seq((1L, "hash join a"), (2L, "hash join b"),
      (3L, "hash join c")).toDF("doc_id", "text")
    InvertedIndex.build(docs, "doc_id", "text", tmp)
    def postingFiles(): Set[String] = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
      try s.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_deletes"))
        .toSet
      finally s.close()
    }
    val before = postingFiles()
    InvertedIndex.delete(docs.filter(col("doc_id") === 2L), "doc_id", tmp)
    val got = InvertedIndex.live(spark, tmp,
        InvertedIndex.phraseQuery(spark, tmp, Seq("hash", "join")))
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L))
    // postings untouched: only the _deletes sidecar was added
    assert(postingFiles() == before)
    // live() is the identity when no sidecar exists
    val tmp2 = java.nio.file.Files.createTempDirectory("invidx-del2-")
      .toString
    InvertedIndex.build(docs, "doc_id", "text", tmp2)
    assert(InvertedIndex.live(spark, tmp2,
      InvertedIndex.phraseQuery(spark, tmp2, Seq("hash", "join")))
      .count() == 3)
  }

  test("the cell predicate constant-folds into a partition filter") {
    val plan = InvertedIndex.phraseQuery(spark, dir, Seq("hash", "join"))
      .queryExecution.executedPlan.toString
    // each term scan must carry a LITERAL cell partition filter (the
    // pmod(xxhash64(lit)) folded at plan time), so unqueried cells are
    // zero I/O at the file level
    assert(plan.contains("PartitionFilters: [isnotnull(cell"))
    assert(plan.contains("(cell#") && plan.contains(" = "))
    // and the term equality reaches parquet as a pushed filter
    assert(plan.contains("PushedFilters: [IsNotNull(term), EqualTo(term,hash)")
      || plan.contains("EqualTo(term,hash)"))
  }

  test("k-term AND/BM25 postings reads are one scan, not k") {
    // the multi-term read is a single scan with an OR-of-foldable cell
    // predicate — file listing and planning paid once, not per term
    def postingsScans(df: org.apache.spark.sql.DataFrame): Int = {
      val plan = df.queryExecution.executedPlan.toString
      // a postings scan's Location is the index root; the norms
      // sidecar prints .../_doclens — count only the former
      java.util.regex.Pattern.quote(s"[file:$dir]").r
        .findAllIn(plan).length
    }
    assert(postingsScans(
      InvertedIndex.andQuery(spark, dir, Seq("hash", "merge"))) == 1)
    assert(postingsScans(InvertedIndex.andQuery(spark, dir,
      Seq("hash", "merge", "sort", "join"))) == 1)
    // bm25 too: tf, df (window) and the norms join all ride one
    // postings scan, independent of k
    val b2 = postingsScans(InvertedIndex.bm25Query(spark, dir,
      Seq("hash", "merge"), topN = 5))
    val b4 = postingsScans(InvertedIndex.bm25Query(spark, dir,
      Seq("hash", "merge", "sort", "join"), topN = 5))
    assert(b2 == 1 && b4 == 1, s"bm25 postings scans: $b2, $b4")
    // the folded cell literals still prune partitions and term IN (...)
    // reaches parquet
    val plan = InvertedIndex.andQuery(spark, dir,
      Seq("hash", "merge", "sort")).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("cell#"))
    assert(plan.contains("In(term, [") || plan.contains("term IN"))
    // and the one-scan rewrite is answer-identical to per-term reads
    val got = InvertedIndex.andQuery(spark, dir, Seq("hash", "join"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 4L), (2L, 2L), (3L, 2L), (4L, 2L)))
  }
}
