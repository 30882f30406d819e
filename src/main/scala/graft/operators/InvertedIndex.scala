package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted positional inverted index — the artifact a search system
  * builds ONCE so that queries never scan the corpus again. Layout:
  * (term, doc_id, pos) postings, hive-partitioned by
  * `cell = pmod(xxhash64(term), nCells)` so a query for k terms reads
  * at most k cells — unqueried cells are ZERO I/O at the file level
  * (the IVF-PQ partition-pruning pattern applied to text retrieval).
  * The build is one tokenize + one partitioned write; at 100 TB the
  * index shuffle happens once and every subsequent phrase/boolean
  * query costs O(df of its terms), not O(corpus).
  *
  * The cell predicate is written as `pmod(xxhash64(lit(term)), n)` —
  * foldable, so Catalyst constant-folds it into a literal partition
  * filter and the scan's PartitionFilters prunes directories at
  * planning time (pinned in InvertedIndexSpec).
  */
object InvertedIndex {

  /** Tokenize and write the postings artifact. Positions are word
    * offsets in the single-space tokenization ([[TextOps.words]]'s
    * contract); empty segments are dropped but POSITIONS ARE KEPT
    * from the raw split, so adjacency means textual adjacency.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      dir: String, nCells: Int = 16): Unit = {
    val postings = docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
    postings
      .withColumn("cell", pmod(xxhash64(col("term")), lit(nCells)))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    // doc-norm sidecar for ranked retrieval (the Lucene "norms" file):
    // the "_" prefix hides it from the postings partition discovery.
    // dl is a PER-ROW projection over the token array — never a
    // groupBy over the exploded postings (that shuffle measured
    // superlinear at 20×; the projection is one narrow pass)
    docs.select(col(idCol).as("doc_id"),
        size(filter(split(col(textCol), " "), t => t =!= ""))
          .cast("long").as("dl"))
      .filter(col("dl") > 0)
      .write.mode("overwrite").parquet(s"$dir/_doclens")
  }

  private def postings(spark: SparkSession, dir: String, term: String,
      nCells: Int): DataFrame =
    spark.read.parquet(dir)
      .filter(col("cell") === pmod(xxhash64(lit(term)), lit(nCells)) &&
        col("term") === term)
      .select(col("doc_id"), col("pos"))

  /** ALL query terms' postings in ONE scan: the cell predicate is an
    * OR of foldable per-term equalities (each `pmod(xxhash64(lit))`
    * constant-folds, so PartitionFilters still prunes to exactly the
    * k terms' cells) and the row filter is one `term IN (...)`. A
    * k-term query plans ONE scan — file listing and planning are paid
    * once, not k times (at many-term queries, e.g. expansion feeding
    * BM25, per-term planning overhead scaled with k).
    */
  private def postingsAll(spark: SparkSession, dir: String,
      terms: Seq[String], nCells: Int): DataFrame = {
    val cellPred = terms.map(t =>
        col("cell") === pmod(xxhash64(lit(t)), lit(nCells)))
      .reduce(_ || _)
    spark.read.parquet(dir)
      .filter(cellPred && col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), col("pos"))
  }

  /** Conjunctive (AND) query via the index alone: one O(sum of df)
    * postings read across the terms' cells (single scan), per-doc
    * per-term position counts, then docs holding ALL terms —
    * count_distinct over the postings, never a corpus scan. Returns
    * (doc_id, hits) with hits = total occurrences of any query term.
    */
  def andQuery(spark: SparkSession, dir: String, terms: Seq[String],
      nCells: Int = 16): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    postingsAll(spark, dir, terms, nCells)
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("term")).as("nt"), count(lit(1)).as("hits"))
      .filter(col("nt") === terms.size)
      .select(col("doc_id"), col("hits"))
  }

  /** BM25 ranked retrieval from the index alone — must equal
    * [[TextOps.bm25Search]]'s corpus-scan result exactly (the shared
    * oracle enforces it). tf/df come from the terms' pruned cells;
    * dl from the norms sidecar, semi-join-pruned to matching docs
    * BEFORE its join (the bm25Search 100 TB rule); corpus stats
    * (N, avgdl) are one scalar aggregate over the sidecar (a stored
    * stats row in a production index).
    */
  def bm25Query(spark: SparkSession, dir: String, terms: Seq[String],
      topN: Int, nCells: Int = 16, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val doclens = spark.read.parquet(s"$dir/_doclens")
    val stats = doclens.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    val tf = postingsAll(spark, dir, terms, nCells)
      .select(col("doc_id").as("id"), col("term").as("w"))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
    // df as a window count over the SAME tf aggregation — a groupBy
    // formulation would re-plan (and re-scan) the postings subtree;
    // the window is one tiny shuffle of the already-aggregated
    // (id, w) rows, keeping the whole query at ONE postings scan
    val tfdf = tf.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("w"))))
    // norms join rides a broadcast of the matching (id, w) set — the
    // corpus-sized doclens is scanned once, never shuffled (the
    // bm25Search 100 TB rule)
    doclens.select(col("doc_id").as("id"), col("dl"))
      .join(broadcast(tfdf), "id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) *
            (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id"))
      .agg(round(sum(col("contrib")), 4).as("score"))
      .select(col("id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
  }

  /** Proximity query via the index: both terms' postings from their
    * pruned cells, doc-keyed equi-join with the |pa − pb| ≤ window
    * residual riding the join — [[TextOps.proximitySearch]]'s plan
    * shape minus the corpus scan.
    */
  def proximityQuery(spark: SparkSession, dir: String, termA: String,
      termB: String, window: Int, nCells: Int = 16): DataFrame =
    postings(spark, dir, termA, nCells)
      .select(col("doc_id"), col("pos").as("pa"))
      .join(postings(spark, dir, termB, nCells)
        .select(col("doc_id"), col("pos").as("pb")), Seq("doc_id"))
      .filter(abs(col("pa") - col("pb")) <= window)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_prox"))

  /** Incremental append: new documents' postings land in the SAME
    * cell layout (append-mode partitioned write) and their norms
    * append to the sidecar — the index absorbs a delta without
    * touching existing files, the q198 IVF-append pattern on the
    * text axis. Queries over the appended index must equal a full
    * rebuild over the union corpus (certified by q306's oracle).
    */
  def append(docs: DataFrame, idCol: String, textCol: String,
      dir: String, nCells: Int = 16): Unit = {
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .withColumn("cell", pmod(xxhash64(col("term")), lit(nCells)))
      .write.mode("append").partitionBy("cell").parquet(dir)
    docs.select(col(idCol).as("doc_id"),
        size(filter(split(col(textCol), " "), t => t =!= ""))
          .cast("long").as("dl"))
      .filter(col("dl") > 0)
      .write.mode("append").parquet(s"$dir/_doclens")
  }

  /** Logical deletes: doc ids append to a `_deletes` sidecar (the
    * Lucene deleted-docs bitmap, the q221 IVF-tombstone pattern) —
    * no postings file is touched; queries anti-join the sidecar.
    * A compaction pass would fold tombstones into a rewrite; until
    * then deletes cost one bounded side-scan per query.
    */
  def delete(ids: DataFrame, idCol: String, dir: String): Unit =
    ids.select(col(idCol).as("doc_id")).distinct()
      .write.mode("append").parquet(s"$dir/_deletes")

  /** Apply tombstones to any per-doc result: left-anti join against
    * the `_deletes` sidecar (absent sidecar ⇒ identity). Sidecar
    * existence resolves through the Hadoop FileSystem for the path —
    * a java.nio check is local-only and would silently ignore
    * tombstones on hdfs:// or s3a://, resurrecting deleted docs.
    */
  def live(spark: SparkSession, dir: String, df: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir, "_deletes")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) df
    else df.join(broadcast(spark.read.parquet(s"$dir/_deletes")),
      Seq("doc_id"), "left_anti")
  }

  /** Exact-phrase hits per document via the index alone: word k's
    * postings shifted by -k and equi-joined on (doc_id, start) — the
    * corpus is never touched, only the phrase terms' cells are read,
    * and the join keys are the natural shuffle keys.
    */
  def phraseQuery(spark: SparkSession, dir: String, phrase: Seq[String],
      nCells: Int = 16): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val first = postings(spark, dir, phrase.head, nCells)
      .select(col("doc_id"), col("pos").as("start"))
    phrase.indices.tail.foldLeft(first) { (acc, k) =>
      acc.join(postings(spark, dir, phrase(k), nCells)
        .select(col("doc_id"), (col("pos") - k).as("start")),
        Seq("doc_id", "start"))
    }
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }
}
